package graft.plans

import org.apache.spark.sql.SparkSession

/** One-off runner for newly-added queries: prints full results so constant
  * oracles can be pinned and DuckDB parity spot-checked. Not part of the
  * driver contract.
  */
object DebugNew {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_decontaminate", "q_sample_stratified", "q_quantile_bins",
        "q_pack", "q_pagerank_gate", "kg_graph_stats", "kg_pagerank_top",
        "kg_bfs_hops")
    val spark = SparkSession.builder()
      .appName("graft-debug-new").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(s"=== $n")
      df.orderBy(df.columns.map(org.apache.spark.sql.functions.col): _*)
        .show(60, truncate = false)
    }
    spark.stop()
  }
}
