package graft.plans

import org.apache.spark.sql.SparkSession

import graft.chunk.Chunkers
import graft.corpus.CorpusSynth
import graft.extract.RuleExtractor
import graft.model._
import graft.operators.{GraphAssembly, Lift}
import graft.resolve.Resolution

/** Per-stage wall-time profile of the in-memory KG chain — finds where the
  * bench seconds go. Usage:
  *   sbt -batch "runMain graft.plans.BenchProfile [pages] [cores]"
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toInt).getOrElse(12000)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cfg = CorpusSynth.Config(nPages = pages, nClusters = math.max(12, pages / 25))
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val pagesDs = CorpusSynth.pages(spark, cfg)
    val chunks = time("synth+chunk") {
      GraphAssembly.chunks(GraphAssembly.docs(pagesDs), Chunkers.forType("regex"))
        .localCheckpoint(true)
    }
    println(s"    chunks: ${chunks.count()}")
    val extracted = time("extract") {
      GraphAssembly.extractAll(chunks, new RuleExtractor).localCheckpoint(true)
    }
    val entities = time("entities") {
      GraphAssembly.entities(extracted).localCheckpoint(true)
    }
    println(s"    entities: ${entities.count()}")
    val emb = time("embed") {
      Resolution.embedEntities(entities, Resolution.Params()).localCheckpoint(true)
    }
    val pairs = time("candidate_pairs") {
      Resolution.candidatePairs(emb, Resolution.Params()).localCheckpoint(true)
    }
    println(s"    pairs: ${pairs.count()}")
    val res = time("resolves_to(CC)") {
      Resolution.resolvesTo(entities, pairs).toDF().localCheckpoint(true)
    }
    val triples = time("triples") {
      GraphAssembly.triples(extracted).localCheckpoint(true)
    }
    println(s"    triples: ${triples.count()}")
    val lifted = time("lift") {
      Lift.resolvedTriples(triples, res.as[ResolvesTo]).toDF().localCheckpoint(true)
    }
    println(s"    resolved: ${lifted.count()}")
    spark.stop()
  }
}
