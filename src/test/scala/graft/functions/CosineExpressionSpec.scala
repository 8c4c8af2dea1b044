package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, SparkTestSession}
import graft.operators.Similarity

class CosineExpressionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }
  import spark.implicits._

  private def vectors(n: Int, dim: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat)))
      .toDF("id", "v")
  }

  test("graft_cosine is bit-identical to cosineUdf and cosineCol") {
    val df = vectors(200, 64, 11)
    val pairs = df.as("a").crossJoin(df.as("b"))
      .where($"a.id" < $"b.id").limit(3000)
      .select($"a.v".as("va"), $"b.v".as("vb"))
    val out = pairs.select(
      expr("graft_cosine(va, vb)").as("native"),
      Similarity.cosineUdf($"va", $"vb").as("viaUdf"),
      Similarity.cosineCol($"va", $"vb").as("viaCol"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "native != udf (bitwise)")
      assert(r.getDouble(0) == r.getDouble(2), "native != column expr (bitwise)")
    }
  }

  test("graft_cosine handles zero norms, nulls, and length mismatch") {
    val df = Seq(
      (Array(0f, 0f), Array(1f, 2f)),
      (Array(1f, 0f, 5f), Array(1f, 0f)), // extra tail ignored (min length)
      (null.asInstanceOf[Array[Float]], Array(1f, 0f)))
      .toDF("a", "b")
    val out = df.select(expr("graft_cosine(a, b)")).collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(out(1).getDouble(0) == 1.0)
    assert(out(2).isNullAt(0))
  }

  test("graft_cosine stays inside whole-stage codegen") {
    // a local relation would be constant-folded — go through a real scan
    val dir = java.nio.file.Files.createTempDirectory("graft-cosine").toString
    vectors(10, 8, 3).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = df.select(expr("graft_cosine(v, v)").as("c"))
      .queryExecution.executedPlan.toString
    // *(n) prefix = codegen span; a UDF would show BatchEvalPython/ScalaUDF fence
    assert(plan.contains("*(1) Project"), s"not codegen'd:\n$plan")
  }
}
