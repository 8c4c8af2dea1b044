package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BPE merge learning + encoding — hand-computed vectors on the classic
  * Sennrich corpus, determinism across partitionings, encode round trips.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Sennrich et al. 2016 §3.2 example vocabulary (no end-of-word marker —
  // documented engine convention): low×5 lower×2 newest×6 widest×3
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainFromWordCounts: hand-computed merge sequence with deterministic tie-breaks") {
    val merges = Bpe.trainFromWordCounts(sennrich, 5)
    // pair counts round 1: (e,s)=9 (s,t)=9 (w,e)=8 (l,o)=7 (o,w)=7 … —
    // ties break to the lexicographically smallest pair
    assert(merges.map(m => (m.left, m.right)) == Seq(
      ("e", "s"),   // 9, beats (s,t) on tie
      ("es", "t"),  // 9 after merge 1
      ("l", "o"),   // 7, beats (o,w) on tie
      ("lo", "w"),  // 7
      ("e", "w"))) // 6, beats (n,e) and (w,est) on tie
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3, 4))
  }

  test("trainFromWordCounts stops early when no pair repeats") {
    val merges = Bpe.trainFromWordCounts(Seq(("ab", 1L), ("cd", 1L)), 10)
    assert(merges.isEmpty, "count-1 pairs are never merged")
  }

  test("segmentWord applies merges in rank order: lowest -> low + est") {
    val ranks = Bpe.trainFromWordCounts(sennrich, 5)
      .map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.segmentWord("lowest", ranks) == Vector("low", "est"))
    assert(Bpe.segmentWord("newest", ranks) == Vector("n", "ew", "est"))
    assert(Bpe.segmentWord("xyz", ranks) == Vector("x", "y", "z"))
    assert(Bpe.segmentWord("low", ranks) == Vector("low"))
  }

  test("train on a DataFrame corpus: same merges, partition-invariant") {
    val rows = sennrich.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = rows.toDF("doc_id", "text")
    val m1 = Bpe.train(df, "text", nMerges = 5)
    val m2 = Bpe.train(df.repartition(7), "text", nMerges = 5)
    assert(m1 == m2, "merge table is partition-invariant")
    assert(m1.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("maxWords cut is deterministic: (freq desc, word) keeps the head") {
    // two words tie at freq 2; the cut to 3 words keeps the lexicographically
    // smaller of the tied pair alongside the freq-3 word
    val df = (Seq.fill(3)("zzz") ++ Seq.fill(2)("bbb") ++ Seq.fill(2)("aaa") ++ Seq("qq"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val top = Bpe.wordCounts(df, "text")
      .orderBy(org.apache.spark.sql.functions.col("freq").desc,
        org.apache.spark.sql.functions.col("word"))
      .limit(3).collect().map(_.getString(0)).toSeq
    assert(top == Seq("zzz", "aaa", "bbb"))
  }

  test("encode: per-doc word and piece counts with the learned table") {
    val corpus = sennrich.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.train(corpus, "text", nMerges = 5)
    val docs = Seq(
      (1L, "the LOWEST lowest"), // the -> t,h,e (3); lowest -> low,est (2) x2
      (2L, "   "),               // blank: zero of both
      (3L, "newest")).toDF("doc_id", "text")
    val byId = Bpe.encode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L) == ((3L, 7L)))
    assert(byId(2L) == ((0L, 0L)))
    assert(byId(3L) == ((1L, 3L)))
  }
}
