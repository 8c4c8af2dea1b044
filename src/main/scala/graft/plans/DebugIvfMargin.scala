package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Margin check for the q_ann_ivf_recall gate: exact aggregate recall on the
  * planted-cluster corpus at several parallelism levels (the kmeans partial
  * combine is float-order sensitive; the gate needs margin over 0.9).
  */
object DebugIvfMargin {
  def main(args: Array[String]): Unit = {
    for (cores <- Seq(4, 8, 32)) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val corpus = spark.range(40L * 125).map { i =>
        val c = (i % 40).toInt
        val crng = new scala.util.Random(7L * 7919 + c)
        val center = Array.fill(64)(crng.nextGaussian().toFloat)
        val vrng = new scala.util.Random(7L * 104729 + i)
        (i, center.map(x => x + 0.35f * vrng.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding").localCheckpoint(true)
      val qs = corpus.where(col("vec_id") % 500 === 0)
      val exact = Similarity.bruteForceTopK(corpus, qs, 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.ivfTopK(corpus, qs, 5)
        .select(col("query_id"), col("neighbor_id"))
      val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(s"cores=$cores recall=${hits / 50.0}")
      spark.stop()
    }
  }
}
