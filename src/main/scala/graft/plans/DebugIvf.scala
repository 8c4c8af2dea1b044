package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Ad-hoc: recall@5 of ivfTopK vs bruteForce for several nProbe values. */
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val qs = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, qs, 5)
      .select(col("query_id"), col("neighbor_id")).cache()
    exact.count()
    for (np <- Seq(2, 4, 6, 8, 12, 16)) {
      val approx = Similarity.ivfTopK(emb, qs, 5, Similarity.IvfParams(nProbe = np))
        .select(col("query_id"), col("neighbor_id"))
      val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(s"nProbe=$np recall=${hits / 50.0}")
    }
    spark.stop()
  }
}
