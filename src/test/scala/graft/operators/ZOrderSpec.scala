package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order clustering: exact Morton codes, exact grid cells, and the
  * data-skipping property — after cluster(), partition z-ranges are
  * disjoint (each output file covers one rectangle of the key space).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValueCol: hand-computed Morton codes") {
    val df = Seq((5L, 3L), (0L, 0L), (7L, 7L)).toDF("a", "b")
    val z = df.select(ZOrder.zValueCol($"a", $"b", 3).as("z"))
      .as[Long].collect()
    // a=101, b=011 → z bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 27
    assert(z.toSeq == Seq(27L, 0L, 63L))
  }

  test("normalized: exact integral grid cells at the range endpoints") {
    val df = Seq(10L, 55L, 100L).toDF("c")
    val cells = df.select(ZOrder.normalized($"c", 10L, 100L, 10).as("cell"))
      .as[Long].collect().toSeq
    assert(cells.head == 0L && cells.last == 1023L)
    assert(cells(1) == (45L * 1023L) / 90L) // floor division, exact
  }

  test("normalized: exact cells when the column range spans more than 2^63") {
    // a fingerprint64-valued column spans [Long.MinValue, Long.MaxValue];
    // (c-mn)*scale in long arithmetic silently overflowed — the decimal
    // path must put the endpoints at cell 0 / 2^bits−1 and the midpoint
    // below the upper half.
    val mn = Long.MinValue + 2
    val mx = Long.MaxValue - 3
    val df = Seq(mn, -1L, mx).toDF("c")
    val cells = df.select(ZOrder.normalized($"c", mn, mx, 10).as("cell"))
      .as[Long].collect().toSeq
    assert(cells.head == 0L && cells.last == 1023L)
    assert(cells(1) == 511L, s"midpoint cell was ${cells(1)}")
    assert(cells.forall(c => c >= 0L && c <= 1023L))
  }

  test("cluster: partition z-ranges are disjoint (the skipping property)") {
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
    val clustered = ZOrder.cluster(grid, "x", "y", bits = 6, partitions = 8)
    val ranges = clustered.withColumn("pid", spark_partition_id())
      .groupBy($"pid").agg(min($"z").as("lo"), max($"z").as("hi"))
      .orderBy($"lo").as[(Int, Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 < b._2, s"overlapping partition z-ranges: $a vs $b")
    }
  }
}
