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
  * Also called by [[graft.Bench]] to embed stage walls in the per-round
  * bench artifact (VERDICT r2: the 59.9s-vs-23.0s KG bench discrepancy was
  * unadjudicable because no per-stage breakdown shipped with the number).
  */
object BenchProfile {

  /** Runs the KG chain stage-by-stage with an eager checkpoint after each,
    * returning (resolvedTripleCount, per-stage walls). The materialization
    * points match KgStages' (extracted/entities/resolvesTo) plus explicit
    * ones per timed stage, so the sum slightly exceeds the un-instrumented
    * end-to-end wall — use it for attribution, not as the headline number.
    */
  def profile(spark: SparkSession, cfg: CorpusSynth.Config,
      onStage: String => Unit = _ => (),
      includeCommunities: Boolean = false): (Long, Vector[(String, Double)]) = {
    import spark.implicits._
    val walls = Vector.newBuilder[(String, Double)]
    def time[T](name: String)(f: => T): T = {
      onStage(name) // listener hook: EnduranceBench tags Spark stages by the
      // logical stage active when they first run, so spill attributes to a
      // pipeline stage name instead of an anonymous AQE lambda
      val t0 = System.nanoTime()
      val r = f
      walls += name -> (System.nanoTime() - t0) / 1e9
      r
    }
    val pagesDs = CorpusSynth.pages(spark, cfg)
    val chunks = time("synth_chunk") {
      GraphAssembly.chunks(GraphAssembly.docs(pagesDs), Chunkers.forType("regex"))
        .localCheckpoint(true)
    }
    val extracted = time("extract") {
      GraphAssembly.extractAll(chunks, new RuleExtractor).localCheckpoint(true)
    }
    val entities = time("entities") {
      GraphAssembly.entities(extracted).localCheckpoint(true)
    }
    // same adaptive-blocking derivation as KgStages.resolvesTo
    val pEff = Resolution.scaledParams(Resolution.Params(), entities.count())
    val emb = time("embed") {
      Resolution.embedEntities(entities, pEff).localCheckpoint(true)
    }
    val pairs = time("candidate_pairs") {
      Resolution.candidatePairs(emb, pEff).localCheckpoint(true)
    }
    val res = time("resolves_to_cc") {
      Resolution.resolvesTo(entities, pairs).toDF().localCheckpoint(true)
    }
    val triples = time("triples") {
      GraphAssembly.triples(extracted).localCheckpoint(true)
    }
    val lifted = time("lift") {
      Lift.resolvedTriples(triples, res.as[ResolvesTo]).toDF().localCheckpoint(true)
    }
    // optional: the community stages (Louvain levels + summaries input) —
    // off in graft.Bench (its KG wall history is chain-through-lift), on in
    // EnduranceBench so the iterative distributed-moving route above the
    // 2M-edge local-finish bound gets a measured large-corpus point too
    if (includeCommunities) time("communities") {
      val louvain = graft.community.Louvain.run(lifted,
        allEntities = Some(res.select("canonical_id").distinct()))
      louvain.levels.map(_.membership.count()).sum
    }
    val n = lifted.count()
    (n, walls.result())
  }

  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toInt).getOrElse(12000)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    // under spark-submit (spark.master already set, e.g. local-cluster for a
    // per-stage profile of the REAL inter-executor shuffle path) inherit the
    // submitted master; standalone sbt runs default to local[cores]
    val builder = SparkSession.builder()
    if (!sys.props.contains("spark.master")) builder.master(s"local[$cores]")
    val spark = builder
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = CorpusSynth.Config(nPages = pages, nClusters = math.max(12, pages / 25))
    val (n, walls) = profile(spark, cfg)
    walls.foreach { case (name, s) => println(f"  $name%-20s $s%8.2f s") }
    println(s"  resolved triples: $n")
    spark.stop()
  }
}
