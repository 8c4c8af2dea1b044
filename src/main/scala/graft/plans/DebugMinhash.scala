package graft.plans

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Ad-hoc diagnostic: why does a high-jaccard pair miss the LSH bands? */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .where("doc_id in (458, 462, 120, 332)")
      .selectExpr("cast(doc_id as string) id", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val p = Dedup.MinHashParams(jaccardThreshold = 0.3)
    val salts = Dedup.minhashSeeds(p.numPerm, p.seed)
    for ((a, b) <- Seq(("458", "462"), ("120", "332"))) {
      val sa = Dedup.shingles(docs(a), p.shingleW)
      val sb = Dedup.shingles(docs(b), p.shingleW)
      val siga = Dedup.minhashSig(sa, salts)
      val sigb = Dedup.minhashSig(sb, salts)
      val eqPos = siga.zip(sigb).count { case (x, y) => x == y }
      val bandsEq = (0 until p.bands).count { bd =>
        (0 until p.rowsPerBand).forall(j => siga(bd * p.rowsPerBand + j) == sigb(bd * p.rowsPerBand + j))
      }
      val jac = sa.distinct.intersect(sb.distinct).length.toDouble /
        (sa.distinct ++ sb.distinct).distinct.length
      println(s"pair ($a,$b): jaccard=$jac eqSlots=$eqPos/${p.numPerm} bandsAgree=$bandsEq/${p.bands}")
    }
    spark.stop()
  }
}
