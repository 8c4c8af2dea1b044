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
