package graft.plans

import org.apache.spark.sql.SparkSession

import graft.community.Louvain
import graft.corpus.CorpusSynth

/** One-off sub-stage timing of the community pipeline at bench scale —
  * attribution for the 89.6s communities wall the r4 endurance probe
  * measured at 150k pages. Not part of the driver contract.
  */
object DebugLouvain {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toInt).getOrElse(150000)
    val spark = SparkSession.builder()
      .appName("graft-debug-louvain").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.er.maxBroadcastBytes", (2L << 30).toString)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[louvain-prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cfg = CorpusSynth.Config(nPages = pages, nClusters = math.max(12, pages / 25))
    val st = graft.SparkEntry.KgStages(spark, cfg)
    val lifted = time("chain_through_lift") { st.resolvedTriples.toDF().localCheckpoint(true) }
    val res = time("resolves_to") { st.resolvesTo.toDF().localCheckpoint(true) }

    val (nodes0, edges0, m0) = time("initGraph") {
      val g = Louvain.initGraph(lifted)
      g._1.count(); g
    }
    val labels = time("localMoving_L1") { Louvain.localMoving(nodes0, edges0, m0).localCheckpoint(true) }
    val lvl = time("coarsen_L1") {
      val l = Louvain.coarsen(labels, edges0, 1)
      l.membership.count(); l.linksTo.count(); l
    }
    val entityEdges = edges0.select("src", "dst")
    time("modularity_L1") { Louvain.modularity(entityEdges, Seq(lvl), 1) }
    time("full_run") { Louvain.run(lifted, allEntities = Some(res.select("canonical_id").distinct())) }
    spark.stop()
  }
}
