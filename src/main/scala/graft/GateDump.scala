package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print a gate query's rows so its constant oracle can be
  * (re-)pinned. Usage: `runMain graft.GateDump [queryName ...]` (default
  * kg_content_gate). Run twice; pin only when both dumps are identical.
  */
object GateDump {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("kg_content_gate")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("gatedump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"== $n")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").show(100, false)
    }
    spark.stop()
  }
}
