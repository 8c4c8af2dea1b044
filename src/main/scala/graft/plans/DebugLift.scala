package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.corpus.CorpusSynth

/** One-off plan/shape inspection of the lift stage at bench scale: prints
  * the physical plan (join strategies) and the per-side cardinalities that
  * decide broadcast vs sort-merge. Not part of the driver contract.
  */
object DebugLift {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toInt).getOrElse(300000)
    val spark = SparkSession.builder()
      .appName("graft-debug-lift").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = CorpusSynth.Config(nPages = pages, nClusters = math.max(12, pages / 25))
    val st = graft.SparkEntry.kgStages(spark, cfg)
    val triples = st.triples.localCheckpoint(true)
    val res = st.resolvesTo
    println(s"raw triples: ${triples.count()}")
    println(s"resolves_to rows: ${res.count()}")
    println(s"distinct raw (subj,pred,obj): ${triples.toDF().select("subj", "pred", "obj").distinct().count()}")
    val lifted = graft.operators.Lift.resolvedTriples(triples, res)
    val t0 = System.nanoTime()
    println(s"lifted: ${lifted.count()}  wall ${(System.nanoTime() - t0) / 1e9}%.2f")
    lifted.explain("formatted")
    spark.stop()
  }
}
