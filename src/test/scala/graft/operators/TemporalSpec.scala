package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** As-of and range joins: hand vectors for the boundary semantics (equal
  * timestamps, tie-break, no-match nulls), then an exhaustive comparison
  * against a naive O(n^2) groundtruth on a randomized corpus — including
  * planted duplicate timestamps — under a partitioning that guarantees the
  * window path actually shuffles.
  */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def frame(rows: (Long, String, Long, Double)*) =
    rows.map { case (id, k, t, v) => (id, k, ts(t), v) }
      .toDF("id", "k", "ts", "v")
      .repartition(7) // force the union/window to reorganize real partitions

  // ---------------------------------------------------------------- as-of

  test("asofJoin backward: latest right at-or-before each left row") {
    val left = frame((1L, "a", 100L, 0.0), (2L, "a", 200L, 0.0), (3L, "a", 50L, 0.0))
    val right = frame((10L, "a", 60L, 1.5), (11L, "a", 100L, 2.5), (12L, "a", 150L, 3.5))
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts",
        rightPayload = Seq("ts", "v"), tieBreak = "id")
      .select($"id", $"asof_ts", $"asof_v")
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.getTime / 1000), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(out == Set(
      (1L, Some(100L), Some(2.5)), // equal ts matches
      (2L, Some(150L), Some(3.5)),
      (3L, None, None)))           // nothing at or before 50
  }

  test("asofJoin backward: equal-timestamp right rows break ties to max tieBreak") {
    val left = frame((1L, "a", 100L, 0.0))
    val right = frame((10L, "a", 90L, 1.0), (12L, "a", 90L, 3.0), (11L, "a", 90L, 2.0))
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts",
        rightPayload = Seq("id", "v"), tieBreak = "id")
      .select($"asof_id", $"asof_v").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((12L, 3.0)))
  }

  test("asofJoin forward: earliest right at-or-after; keys never cross") {
    val left = frame((1L, "a", 100L, 0.0), (2L, "b", 100L, 0.0))
    val right = frame((10L, "a", 99L, 1.0), (11L, "a", 120L, 2.0), (12L, "a", 130L, 3.0))
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts",
        rightPayload = Seq("v"), tieBreak = "id", direction = "forward")
      .select($"id", $"asof_v")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(1L -> Some(2.0), 2L -> None)) // key b has no right rows
  }

  test("asofJoin matches the naive O(n^2) groundtruth on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val keys = Array("a", "b", "c", "d")
    def mk(n: Int, idBase: Long) = (0 until n).map { i =>
      // duplicate timestamps planted: ts drawn from a small grid
      (idBase + i, keys(rnd.nextInt(keys.length)), rnd.nextInt(50).toLong * 10L,
        rnd.nextInt(1000) / 10.0)
    }
    val lrows = mk(120, 1000L)
    val rrows = mk(150, 5000L)
    val expectBackward = lrows.map { case (id, k, t, _) =>
      val cands = rrows.filter(r => r._2 == k && r._3 <= t)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._3, r._1))._1)) // max ts, then max id
    }.toMap
    val expectForward = lrows.map { case (id, k, t, _) =>
      val cands = rrows.filter(r => r._2 == k && r._3 >= t)
      id -> (if (cands.isEmpty) None
             else {
               val bestTs = cands.map(_._3).min
               Some(cands.filter(_._3 == bestTs).maxBy(_._1)._1) // min ts, max id
             })
    }.toMap
    for (dir <- Seq("backward", "forward")) {
      val got = Temporal.asofJoin(frame(lrows: _*), frame(rrows: _*), Seq("k"), "ts", "ts",
          rightPayload = Seq("id"), tieBreak = "id", direction = dir)
        .select($"id", $"asof_id")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val expect = if (dir == "backward") expectBackward else expectForward
      assert(got.size == lrows.size, s"$dir: every left row survives")
      assert(got == expect, s"$dir mismatch")
    }
  }

  test("asofJoin: NULL-timestamp right rows never match; NULL-ts left rows match nothing") {
    val left = Seq((1L, "a", Some(ts(100L)), 0.0), (2L, "a", Option.empty[Timestamp], 0.0))
      .toDF("id", "k", "ts", "v").repartition(3)
    // one genuine right row at 60 plus a NULL-ts right row that under
    // nulls-first ordering used to be carried onto every left row
    val right = Seq((10L, "a", Some(ts(60L)), 1.5), (11L, "a", Option.empty[Timestamp], 9.9))
      .toDF("id", "k", "ts", "v").repartition(3)
    for (dir <- Seq("backward", "forward")) {
      val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts",
          rightPayload = Seq("id", "v"), tieBreak = "id", direction = dir)
        .select($"id", $"asof_id")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val expect1 = if (dir == "backward") Some(10L) else None // 60 <= 100 only backward
      assert(out == Map(1L -> expect1, 2L -> None), s"dir=$dir")
    }
  }

  test("rangeJoin: inverted intervals match nothing and don't defeat the budget guard") {
    val points = frame((1L, "a", 100L, 0.0))
    val intervals = Seq(
      (100L, "a", ts(150L), ts(50L)),  // inverted: end < start — zero cells, zero matches
      (101L, "a", ts(90L), ts(110L)))  // genuine: matches point 1
      .toDF("iv_id", "k", "w_start", "w_end").repartition(2)
    val out = Temporal.rangeJoin(points, intervals, Seq("k"), "ts", "w_start", "w_end",
        gridSeconds = 10L, maxCellsPerInterval = 4)
      .select($"id", $"iv_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 101L)))
  }

  // ----------------------------------------------------------- range join

  test("rangeJoin: inclusive bounds, exact pair set vs naive filter") {
    val points = frame((1L, "a", 100L, 0.0), (2L, "a", 160L, 0.0),
      (3L, "a", 161L, 0.0), (4L, "b", 100L, 0.0))
    val intervals = Seq(
      (100L, "a", ts(100L), ts(160L)), // picks up 1 (start-inclusive) and 2 (end-inclusive)
      (101L, "a", ts(150L), ts(200L)), // picks up 2 and 3
      (102L, "b", ts(0L), ts(50L)))    // nothing
      .toDF("iv_id", "k", "w_start", "w_end").repartition(5)
    val out = Temporal.rangeJoin(points, intervals, Seq("k"), "ts", "w_start", "w_end",
        gridSeconds = 60L)
      .select($"id", $"iv_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L)))
  }

  test("rangeJoin matches the naive theta join on a randomized corpus") {
    val rnd = new scala.util.Random(7)
    val keys = Array("a", "b", "c")
    val pts = (0 until 200).map(i =>
      (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(1000).toLong, 0.0))
    val ivs = (0 until 80).map { i =>
      val s = rnd.nextInt(1000).toLong
      (1000L + i, keys(rnd.nextInt(3)), ts(s), ts(s + rnd.nextInt(120).toLong))
    }
    val expect = (for {
      (pid, pk, pt, _) <- pts
      (iid, ik, s, e) <- ivs
      if ik == pk && pt * 1000L >= s.getTime && pt * 1000L <= e.getTime
    } yield (pid, iid)).toSet
    val got = Temporal.rangeJoin(frame(pts: _*),
        ivs.toDF("iv_id", "k", "w_start", "w_end").repartition(4),
        Seq("k"), "ts", "w_start", "w_end", gridSeconds = 37L) // grid misaligned on purpose
      .select($"id", $"iv_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "no duplicate pairs")
    assert(got.toSet == expect)
  }

  test("rangeJoin fails in-plan when an interval overflows the cell budget") {
    val points = frame((1L, "a", 100L, 0.0))
    val intervals = Seq((100L, "a", ts(0L), ts(10000L)))
      .toDF("iv_id", "k", "w_start", "w_end")
    val ex = intercept[Exception] {
      Temporal.rangeJoin(points, intervals, Seq("k"), "ts", "w_start", "w_end",
        gridSeconds = 1L, maxCellsPerInterval = 100).collect()
    }
    assert(ex.getMessage != null)
  }
}
