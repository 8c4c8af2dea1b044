package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** KMV bottom-k sketch: the state must equal the k unsigned-smallest
  * distinct hashes of the input set under EVERY partitioning (the property
  * the oracle compare relies on), the distinct estimator must be exact
  * below saturation and within bounds above it, and the Jaccard estimator
  * must recover planted overlaps.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sketch(hashes: Seq[Long], k: Int, parts: Int): Seq[Long] =
    hashes.toDF("h").repartition(parts)
      .agg(KmvSketch.kmv(k)(col("h")).as("r"))
      .select(col("r.hashes")).as[Seq[Long]].head()

  test("state = k unsigned-smallest distinct hashes, any partitioning") {
    val rnd = new scala.util.Random(5)
    // mix of positive and negative longs (negatives are LARGE unsigned) + dups
    val hs = Seq.fill(3000)(rnd.nextLong()) ++ Seq(1L, 2L, 3L, -1L, -2L)
    val withDups = rnd.shuffle(hs ++ hs.take(500))
    val expect = hs.distinct.sorted(KmvSketch.UnsignedLongOrdering).take(64)
    for (parts <- Seq(1, 4, 13)) {
      assert(sketch(withDups, 64, parts) == expect, s"parts=$parts")
    }
  }

  test("unsaturated sketch holds the whole set; estimate is exact") {
    val hs = Seq(10L, 20L, 30L, 20L, 10L)
    val got = sketch(hs, 64, 3)
    assert(got == Seq(10L, 20L, 30L))
    assert(KmvSketch.estimateDistinct(64, got) == 3.0)
  }

  test("distinct estimate within 15% on a 20k universe at k=1024") {
    val rnd = new scala.util.Random(11)
    val hs = (0 until 20000).map(_ => rnd.nextLong()).distinct
    val got = sketch(hs, 1024, 7)
    val est = KmvSketch.estimateDistinct(1024, got)
    assert(math.abs(est - hs.size) <= 0.15 * hs.size, s"est=$est exact=${hs.size}")
  }

  test("Jaccard estimate recovers a planted 1/3 overlap") {
    val rnd = new scala.util.Random(23)
    val shared = (0 until 5000).map(_ => rnd.nextLong())
    val onlyA = (0 until 5000).map(_ => rnd.nextLong())
    val onlyB = (0 until 5000).map(_ => rnd.nextLong())
    val ka = sketch(shared ++ onlyA, 1024, 5)
    val kb = sketch(shared ++ onlyB, 1024, 5)
    val est = KmvSketch.estimateJaccard(1024, ka, kb)
    assert(math.abs(est - 1.0 / 3.0) <= 0.06, s"est=$est expected ~0.333")
  }

  test("merge keeps at most k and never loses a smaller hash") {
    val agg = new KmvSketch.Kmv(4)
    var a = agg.zero
    Seq(100L, 200L, 300L, 400L).foreach(h => a = agg.reduce(a, h))
    var b = agg.zero
    Seq(50L, 150L, 500L).foreach(h => b = agg.reduce(b, h))
    val m = agg.finish(agg.merge(a, b))
    assert(m.hashes == Seq(50L, 100L, 150L, 200L))
  }
}
