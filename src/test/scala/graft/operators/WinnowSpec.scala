package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Winnowing fingerprint selection: exact parity with a naive windows-sweep
  * reference, the Schleimer guarantee (shared ≥ w+k−1 token run ⇒ shared
  * selected fingerprint), density bounds, and the stats/pairs operators.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Naive reference: for every full window pick the (unsigned-min hash,
    * rightmost) shingle; union of picks = selected set. O(g·w). */
  private def naive(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val g = tk.length - k + 1
    if (g <= 0) return Set.empty
    val h = (0 until g).map(i => TextStats.fingerprint64(tk.slice(i, i + k).mkString(" ")))
    val ww = math.min(w, g)
    (ww - 1 until g).map { j =>
      val win = (j - ww + 1) to j
      // unsigned hash order encoded by flipping the sign bit; -i = rightmost tie
      val best = win.minBy(i => (h(i) ^ Long.MinValue, -i))
      (best, h(best))
    }.toSet
  }

  test("select matches the naive windows-sweep on random-ish text") {
    val rnd = new scala.util.Random(7)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    for (trial <- 0 until 30) {
      val n = 1 + rnd.nextInt(40)
      val text = Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      for ((k, w) <- Seq((4, 5), (2, 3), (1, 4), (3, 1))) {
        val got = Winnow.select(text, k, w).toSet
        assert(got == naive(text, k, w), s"trial=$trial k=$k w=$w text=$text")
      }
    }
  }

  test("selection order is position-ascending with no duplicate positions") {
    val text = Array.fill(60)("tok").zipWithIndex
      .map { case (t, i) => s"$t${i % 9}" }.mkString(" ")
    val sel = Winnow.select(text, 4, 5)
    assert(sel.map(_._1).toSeq == sel.map(_._1).sorted.distinct.toSeq)
  }

  test("short documents: < k tokens select nothing; >= k select at least one") {
    assert(Winnow.select("one two three", 4, 5).isEmpty)
    assert(Winnow.select("one two three four", 4, 5).length == 1)
    assert(Winnow.select("", 4, 5).isEmpty)
  }

  test("pathological over-long documents degrade to empty selection, no throw") {
    // >= 2^20 shingles breaches the oracle key-packing bound; one such web
    // document must not fail the whole job from inside an executor.
    val sb = new java.lang.StringBuilder(4 << 20)
    var i = 0
    while (i < (1 << 20)) { sb.append("x "); i += 1 }
    assert(Winnow.select(sb.toString, 1, 5).isEmpty)
    // one token below the bound still selects normally
    assert(Winnow.select("a b c d e f", 1, 5).nonEmpty)
  }

  test("Schleimer guarantee: shared >= w+k-1 token run => shared fingerprint") {
    val rnd = new scala.util.Random(11)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val k = 4; val w = 5
    val shared = Array.fill(w + k - 1)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    for (trial <- 0 until 20) {
      def pad() = Array.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val a = s"${pad()} $shared ${pad()}"
      val b = s"${pad()} $shared ${pad()}"
      val fa = Winnow.select(a, k, w).map(_._2).toSet
      val fb = Winnow.select(b, k, w).map(_._2).toSet
      assert(fa.intersect(fb).nonEmpty, s"trial=$trial")
    }
  }

  test("density is near 2/(w+1) on hash-random text") {
    val rnd = new scala.util.Random(3)
    val text = Array.fill(3000)(rnd.alphanumeric.take(6).mkString).mkString(" ")
    val sel = Winnow.select(text, 4, 5)
    val density = sel.length.toDouble / (3000 - 4 + 1)
    assert(density > 0.2 && density < 0.5, s"density=$density (expected ~1/3)")
  }

  test("stats emits n_grams/n_selected/digest consistent with select") {
    val rows = Seq(1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "a b", 3L -> "x y z w")
    val st = Winnow.stats(rows.toDF("doc_id", "text"), k = 4, w = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val sel1 = Winnow.select(rows.head._2, 4, 5)
    assert(st(1L).getLong(1) == 7) // 10 tokens, k=4
    assert(st(1L).getLong(2) == sel1.length)
    assert(st(1L).getString(3) == sel1.map(x => BigInt(x._2)).sum.toString)
    assert(st(2L).getLong(1) == 0 && st(2L).getLong(2) == 0 && st(2L).getString(3) == "0")
    assert(st(3L).getLong(1) == 1 && st(3L).getLong(2) == 1)
  }

  test("pairs finds planted near-duplicates and respects maxDocFreq") {
    val common = "shared run of tokens that is long enough to guarantee a hit honestly"
    val df = Seq(
      1L -> s"unique left padding words here $common and unique right side one",
      2L -> s"different start of document two $common with other trailing words",
      3L -> "completely unrelated text with nothing in common at all here now then"
    ).toDF("doc_id", "text")
    val got = Winnow.pairs(df, k = 4, w = 5, minShared = 1)
      .select($"a", $"b").as[(String, String)].collect().toSet
    assert(got.contains(("1", "2")))
    assert(!got.exists(p => p._1 == "3" || p._2 == "3"))
    // a fingerprint present in every doc is dropped by maxDocFreq=1
    val boiler = Seq(1L -> common, 2L -> common, 3L -> common).toDF("doc_id", "text")
    assert(Winnow.pairs(boiler, k = 4, w = 5, minShared = 1, maxDocFreq = 1).isEmpty)
  }
}
