package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.chunk.Chunkers
import graft.corpus.CorpusSynth
import graft.extract.RuleExtractor
import graft.operators.GraphAssembly
import graft.resolve.Resolution

/** Step-level timing inside Resolution.candidatePairs. */
object DebugPairs {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toInt).getOrElse(40000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cfg = CorpusSynth.Config(nPages = pages, nClusters = math.max(12, pages / 25))
    val chunks = GraphAssembly.chunks(
      GraphAssembly.docs(CorpusSynth.pages(spark, cfg)), Chunkers.forType("regex"))
    val extracted = GraphAssembly.extractAll(chunks, new RuleExtractor).localCheckpoint(true)
    val entities = GraphAssembly.entities(extracted).localCheckpoint(true)
    println(s"entities: ${entities.count()}")

    val p = Resolution.Params()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val emb = time("embed") {
      Resolution.embedEntities(entities, p).localCheckpoint(true)
    }
    val sigs = time("sigs") {
      Resolution.debugSigs(emb, p).localCheckpoint(true)
    }
    println(s"  sig rows: ${sigs.count()}")
    val bucketed = time("bucket-prune") {
      sigs.withColumn("bucket_n", count(lit(1)).over(Window.partitionBy($"band", $"sig")))
        .where($"bucket_n" <= p.maxBucket).drop("bucket_n").localCheckpoint(true)
    }
    val cand = time("bucket-join") {
      val l = bucketed.select($"band", $"sig", $"entity_id".as("src"))
      val r = bucketed.select($"band", $"sig", $"entity_id".as("dst"))
      l.join(r, Seq("band", "sig")).where($"src" < $"dst")
        .select("src", "dst").dropDuplicates("src", "dst").localCheckpoint(true)
    }
    println(s"  cand pairs: ${cand.count()}")
    val withEmb = time("emb-joins") {
      cand
        .join(emb.select($"entity_id".as("src"), $"embedding".as("emb_a")), "src")
        .join(emb.select($"entity_id".as("dst"), $"embedding".as("emb_b")), "dst")
        .localCheckpoint(true)
    }
    val scored = time("cosine+filter") {
      val cosUdf = udf((a: Array[Float], b: Array[Float]) => graft.extract.VectorOps.cosine(a, b))
      withEmb.withColumn("cos", cosUdf($"emb_a", $"emb_b"))
        .where($"cos" >= lit(p.cosineThreshold - 1e-6))
        .select($"src", $"dst", $"cos").localCheckpoint(true)
    }
    println(s"  scored: ${scored.count()}")
    val topk = time("topk-window") {
      val sym = scored.unionByName(scored.select($"dst".as("src"), $"src".as("dst"), $"cos"))
      val w = Window.partitionBy($"src").orderBy($"cos".desc, $"dst")
      sym.withColumn("rank", row_number().over(w))
        .where($"rank" <= p.topK - 1).drop("rank").localCheckpoint(true)
    }
    println(s"  topk: ${topk.count()}")
    spark.stop()
  }
}
