package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600L * 1000 * 10 + min * 60000L)

  test("windowedCounts: watermark drops late rows, windows finalize in append mode") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = StreamingOps.windowedCounts(
      in.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", windowLen = "10 minutes", lateness = "5 minutes")
    val q = out.writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two events in window [10:00,10:10), one in [10:10,10:20)
    in.addData((ts(2), "click", 1.0), (ts(4), "click", 2.0), (ts(12), "view", 5.0))
    q.processAllAvailable()
    // batch 2: advance watermark far past the first windows
    in.addData((ts(40), "click", 1.0))
    q.processAllAvailable()
    // batch 3: LATE event for the already-finalized first window -> dropped
    in.addData((ts(3), "click", 100.0))
    q.processAllAvailable()
    // close remaining windows
    in.addData((ts(80), "view", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("wc")
      .select($"window_start", $"event_type", $"cnt", $"sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows.contains((ts(0), "click", 2L, 3.0)), s"got $rows")
    assert(rows.contains((ts(10), "view", 1L, 5.0)))
    assert(!rows.exists { case (w, t, _, s) => w == ts(0) && t == "click" && s > 3.0 },
      "late row must not inflate the finalized window")
  }

  test("streaming sessionize == batch sessionize on the same events") {
    implicit val sq = spark.sqlContext
    import StreamingOps.{SessIn, SessionOut}
    val gapSec = 1800L // 30 min

    val b1 = Seq(SessIn("u1", "e1", ts(0), 1.25), SessIn("u1", "e2", ts(5), 2.50),
      SessIn("u2", "e3", ts(3), 10.0))
    val b2 = Seq(SessIn("u1", "e4", ts(65), 4.00)) // >30min after e2: new session
    // watermark pusher: a throwaway user far in the future closes all state
    val b3 = Seq(SessIn("zz", "e9", ts(500), 0.0))

    val in = MemoryStream[SessIn]
    val q = StreamingOps.sessionize(in.toDS(), gapSeconds = gapSec)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    Seq(b1, b2, b3).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    in.addData(SessIn("zz", "e10", ts(999), 0.0)) // fire zz's own timeout
    q.processAllAvailable()
    q.stop()

    val streaming = spark.table("sess").as[SessionOut].collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.sum_value))
      .toSet
    val batch = graft.operators.Events.sessionize(
        (b1 ++ b2 ++ b3).toDF().select($"user_id", $"event_id", $"ts", $"value"),
        gapSeconds = gapSec)
      .select($"user_id", $"session_start", $"session_end", $"n_events", $"sum_value")
      .as[(String, Timestamp, Timestamp, Long, Double)].collect().toSet
    // zz's last event (e10) is still open in state at q.stop(); every closed
    // session must match the batch answer exactly
    val batchClosed = batch.filter { case (u, _, end, _, _) =>
      !(u == "zz" && end == ts(999)) }
    assert(streaming == batchClosed, s"streaming $streaming vs batch $batchClosed")
    assert(streaming.count(_._1 == "u1") == 2, "u1 split into two sessions")
  }

  test("dedupByDigest emits exactly one row per digest across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[StreamingOps.DedupIn]
    val out = StreamingOps.dedupByDigest(in.toDS())
    val q = out.writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append()).start()

    in.addData(
      StreamingOps.DedupIn("h1", "doc-a", ts(1)),
      StreamingOps.DedupIn("h1", "doc-b", ts(2)),
      StreamingOps.DedupIn("h2", "doc-c", ts(3)))
    q.processAllAvailable()
    in.addData( // h1 again in a later micro-batch -> suppressed by state
      StreamingOps.DedupIn("h1", "doc-d", ts(20)),
      StreamingOps.DedupIn("h3", "doc-e", ts(21)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("dd").as[StreamingOps.DedupOut].collect()
    assert(rows.map(_.digest).sorted.toSeq == Seq("h1", "h2", "h3"))
    assert(rows.find(_.digest == "h1").get.doc_id == "doc-a", "first arrival wins")
  }
}
