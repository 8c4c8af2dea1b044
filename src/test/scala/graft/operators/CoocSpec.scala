package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Skip-gram co-occurrence counts: hand-computed window semantics, the
  * unordered-pair key, min-count/top-n behavior, and partition invariance.
  */
class CoocSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed pairs on a tiny corpus, window=2") {
    // tokens: a b a c — windows (i, i+d], d<=2:
    //   a-b (0,1), a-a skipped (0,2), b-a (1,2), b-c (1,3), a-c (2,3)
    // unordered: (a,b)x2, (b,c)x1, (a,c)x1; minCount=1 keeps all
    val df = Seq("a b a c").toDF("text")
    val got = TextStats.coocPairs(df, window = 2, minCount = 1, topN = 10)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "b", 2L, 2L, 1L),
      ("a", "c", 1L, 2L, 1L),
      ("b", "c", 1L, 1L, 1L)))
  }

  test("same-token pairs are skipped, window clipped at document end") {
    val df = Seq("x x x").toDF("text")
    assert(TextStats.coocPairs(df, window = 3, minCount = 1).isEmpty)
    val df2 = Seq("p q").toDF("text")
    val got = TextStats.coocPairs(df2, window = 5, minCount = 1)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("p", "q", 1L, 1L, 1L)))
  }

  test("minCount prunes, topN is a deterministic total-ordered head") {
    val df = Seq("a b a b a b", "c d").toDF("text")
    val got = TextStats.coocPairs(df, window = 1, minCount = 2, topN = 1)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 5L, 3L, 3L)))
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(5)
    val vocab = Array("t1", "t2", "t3", "t4", "t5")
    val rows = (0 until 50).map(_ =>
      Array.fill(20)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val df = rows.toDF("text")
    val a = TextStats.coocPairs(df.repartition(1), window = 3, minCount = 2, topN = 50)
      .collect().map(_.toString).sorted.toSeq
    val b = TextStats.coocPairs(df.repartition(7), window = 3, minCount = 2, topN = 50)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("pmiCol: ln(c_ab * N / (c_a * c_b))") {
    val df = Seq((4L, 8L, 10L, 100L)).toDF("pc", "ca", "cb", "n")
    val got = df.select(TextStats.pmiCol(
      org.apache.spark.sql.functions.col("pc"),
      org.apache.spark.sql.functions.col("ca"),
      org.apache.spark.sql.functions.col("cb"),
      org.apache.spark.sql.functions.col("n")).as("pmi"))
      .as[Double].head()
    assert(math.abs(got - math.log(4.0 * 100 / (8 * 10))) < 1e-12)
  }
}
