package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Misra–Gries sketch: exactness when k covers the support, the two
  * mathematical guarantees under adversarial partitionings (underestimates
  * only, error within the tracked bound, heavy hitters never evicted), and
  * direct unit tests of the reduce/merge rules.
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sketch(tokens: Seq[String], k: Int, parts: Int): FreqSketch.MgResult =
    tokens.toDF("token").repartition(parts)
      .agg(FreqSketch.misraGries(k)(col("token")).as("r"))
      .select(col("r.items").as("items"), col("r.err").as("err"))
      .as[FreqSketch.MgResult].head()

  test("k >= distinct support: exact counts, zero error") {
    val toks = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")
    for (parts <- Seq(1, 3, 8)) {
      val r = sketch(scala.util.Random.shuffle(toks), k = 8, parts = parts)
      assert(r.items == Map("a" -> 7L, "b" -> 3L, "c" -> 1L))
      assert(r.err == 0L)
    }
  }

  test("guarantees hold under every partitioning: underestimate, bound, heavy present") {
    val rnd = new scala.util.Random(13)
    // zipf-ish: token i appears ~ 2000/(i+1) times over a 100-token universe
    val toks = rnd.shuffle((0 until 100).flatMap(i => Seq.fill(2000 / (i + 1))(s"t$i")))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toLong
    for (k <- Seq(5, 16, 64); parts <- Seq(1, 4, 17)) {
      val r = sketch(toks, k, parts)
      assert(r.items.size <= k, s"k=$k parts=$parts: at most k counters survive")
      assert(r.err <= n / (k + 1), s"k=$k parts=$parts: err ${r.err} > N/(k+1)")
      r.items.foreach { case (t, est) =>
        val tru = exact(t)
        assert(est <= tru, s"k=$k parts=$parts: $t overestimated ($est > $tru)")
        assert(tru - est <= r.err, s"k=$k parts=$parts: $t outside tracked bound")
      }
      exact.foreach { case (t, tru) =>
        if (tru > n / (k + 1))
          assert(r.items.contains(t), s"k=$k parts=$parts: heavy hitter $t evicted")
      }
    }
  }

  test("reduce: decrement-all evicts zeroed counters and counts the mass") {
    val mg = new FreqSketch.MisraGries(2)
    var b = mg.zero
    Seq("a", "a", "b", "c").foreach(x => b = mg.reduce(b, x)) // c hits a full map
    val r = mg.finish(b)
    assert(r.items == Map("a" -> 1L)) // a:2,b:1 then decrement-all on c
    assert(r.err == 1L)
    assert(mg.finish(mg.reduce(mg.zero, null)).items.isEmpty) // null-safe
  }

  test("merge: (k+1)-th largest cut restores capacity and accrues err") {
    val mg = new FreqSketch.MisraGries(2)
    var a = mg.zero
    Seq("a", "a", "a", "b").foreach(x => a = mg.reduce(a, x))   // a:3 b:1
    var c = mg.zero
    Seq("c", "c", "d").foreach(x => c = mg.reduce(c, x))        // c:2 d:1
    val m = mg.finish(mg.merge(a, c)) // a:3 c:2 b:1 d:1 → cut=1 → a:2 c:1
    assert(m.items == Map("a" -> 2L, "c" -> 1L))
    assert(m.err == 1L)
  }
}
