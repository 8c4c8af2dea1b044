package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Exact distributed selection: kth order statistic by value bisection —
  * verified against in-memory sorts, duplicates and negatives included.
  */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exactKth matches the sorted array on duplicates and negatives") {
    val xs = Seq(5L, -3L, 5L, 7L, 0L, -3L, 12L, 5L)
    val df = xs.toDF("v")
    val sorted = xs.sorted
    (1 to xs.length).foreach { k =>
      assert(Selection.exactKth(df, $"v", k) == sorted(k - 1), s"k=$k")
    }
  }

  test("exactMedian: lower median for even counts; nulls ignored; k bound enforced") {
    assert(Selection.exactMedian(Seq(1L, 2L, 3L, 4L).toDF("v"), $"v") == 2L)
    assert(Selection.exactMedian(Seq(9L, 1L, 5L).toDF("v"), $"v") == 5L)
    val withNulls = Seq(Some(10L), None, Some(20L), None, Some(30L)).toDF("v")
    assert(Selection.exactMedian(withNulls, $"v") == 20L)
    intercept[IllegalArgumentException] {
      Selection.exactKth(Seq(1L).toDF("v"), $"v", 2)
    }
  }

  test("exactKth is exact when the value range spans more than 2^63") {
    // lo near Long.MinValue and hi near Long.MaxValue: hi - lo overflows
    // signed long, so the old `lo + (hi-lo)/2` midpoint broke the bisection
    // invariant; the bitwise floor-average midpoint must stay exact.
    val xs = Seq(Long.MinValue + 1, -5L, 0L, 3L, Long.MaxValue - 1)
    val df = xs.toDF("v")
    val sorted = xs.sorted
    (1 to xs.length).foreach { k =>
      assert(Selection.exactKth(df, $"v", k) == sorted(k - 1), s"k=$k")
    }
  }

  test("exactKth on a hashed column agrees with an exact full sort") {
    // 20-bit value range keeps the bisection at ~20 count passes per k —
    // the full 64-bit range costs 64 rounds of Catalyst planning per k,
    // which is executor-trivial at scale but minutes of driver time here
    val df = (0 until 5000).map(i => Dedup.mix64(i.toLong) >>> 44).toDF("v")
    val sorted = df.as[Long].collect().sorted
    Seq(1, 2500, 5000).foreach { k =>
      assert(Selection.exactKth(df, $"v", k) == sorted(k - 1), s"k=$k")
    }
  }
}
