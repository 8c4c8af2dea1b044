package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.chunk.Chunkers
import graft.corpus.CorpusSynth
import graft.extract.RuleExtractor
import graft.model.Triple

/** The streaming skin must emit exactly the same triples as the batch
  * stages on the same pages — and keep exactly-once across restarts.
  */
class StreamingKgSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming narrow stages == batch narrow stages on the same pages") {
    val cfg = CorpusSynth.Config(nPages = 40, nClusters = 8)
    val pages = CorpusSynth.pages(spark, cfg)

    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val outDir = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    pages.write.mode("overwrite").parquet(inDir)

    val q = StreamingKg.run(spark, inDir, outDir, ckpt,
      Chunkers.forType("regex"), new RuleExtractor)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$outDir/triples").as[Triple]
    val (_, batchTriples, _) = StreamingKg.narrowStages(
      pages, Chunkers.forType("regex"), new RuleExtractor)
    assert(streamed.count() == batchTriples.count())
    assert(streamed.toDF().exceptAll(batchTriples.toDF()).isEmpty)
    assert(batchTriples.toDF().exceptAll(streamed.toDF()).isEmpty)

    // restart with no new input: exactly-once, nothing re-emitted
    val q2 = StreamingKg.run(spark, inDir, outDir, ckpt,
      Chunkers.forType("regex"), new RuleExtractor)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$outDir/triples").count() == batchTriples.count())
  }
}
