package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Raw PQ-ADC recall across parameter settings on the gate corpus —
  * used to pin the q_pq_recall threshold. Not part of the driver contract.
  */
object DebugPq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Pq

    val corpus = graft.SparkEntry.debugClusteredVecs(spark, 40, 125, 64, 7)
      .localCheckpoint(true)
    val qs = corpus.where(col("vec_id") % 500 === 0)
    val exact = Pq.exactDotTopK(corpus, qs, topK = 10)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)

    for {
      coarseK <- Seq(40, 64, 128)
      m <- Seq(8, 16)
      k <- Seq(64, 256)
    } {
      val rp = Pq.ResidualParams(coarseK = coarseK, m = m, k = k, iters = 5)
      val model = Pq.trainResidual(corpus, rp)
      val codes = Pq.encodeResidual(corpus, model)
      val approx = Pq.adcTopKResidual(qs, codes, model, topK = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"  coarseK=$coarseK%-4d m=$m%-3d k=$k%-4d recall@10 = ${hits / 100.0}%.2f")
    }

    // IVF-ADC: probed-scan recall at the gate setting across nProbe
    val model = Pq.trainResidual(corpus,
      Pq.ResidualParams(coarseK = 64, m = 16, k = 256, iters = 5))
    val codes = Pq.encodeResidual(corpus, model).localCheckpoint(true)
    Seq(4, 8, 16, 64).foreach { nProbe =>
      val approx = Pq.ivfAdcTopK(qs, codes, model, topK = 10, nProbe = nProbe)
        .select(col("query_id"), col("neighbor_id"))
      val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"  ivfadc nProbe=$nProbe%-3d recall@10 = ${hits / 100.0}%.2f")
    }
    spark.stop()
  }
}
