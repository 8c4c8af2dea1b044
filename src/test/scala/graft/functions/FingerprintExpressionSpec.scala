package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.TextStats

/** Fingerprint64 native expression: bit parity with the UDF it promotes
  * (the q_fingerprint / q_sample_* / q_shard_* oracles pin these exact
  * values), null handling, SQL registration, and codegen inlining.
  */
class FingerprintExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fingerprintCol is bit-identical to fingerprintUdf") {
    val rnd = new scala.util.Random(31)
    val texts = Seq("", " ", "a", "The  Quick\tBrown\nFox", "déjà vu — naïve",
      "文字 と 空白", "x" * 5000) ++
      (0 until 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(80)).mkString(" "))
    val out = texts.toDF("t").repartition(5)
      .select(TextStats.fingerprintCol($"t").as("a"), TextStats.fingerprintUdf($"t").as("b"))
      .as[(Long, Long)].collect()
    out.foreach { case (a, b) => assert(a == b) }
    // and both equal the plain-JVM function
    val local = texts.map(TextStats.fingerprint64)
    assert(texts.toDF("t").select(TextStats.fingerprintCol($"t")).as[Long].collect().toSeq
      .sorted == local.sorted)
  }

  test("null propagates; SQL registration works") {
    graft.GraftExtensions.register(spark)
    val out = Seq(Some("abc"), None).toDF("t")
      .select(expr("graft_fingerprint64(t)").as("h")).collect()
    assert(out.exists(_.isNullAt(0)))
    assert(out.exists(r => !r.isNullAt(0) && r.getLong(0) == TextStats.fingerprint64("abc")))
  }

  test("stays inside whole-stage codegen (no UDF fence)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fp").toString
    (0 until 50).map(i => s"doc $i text").toDF("t").write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(TextStats.fingerprintCol(col("t")).as("h"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }
}
