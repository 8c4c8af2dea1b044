package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Product quantization: exactness when vectors sit on centroids,
  * determinism across partitionings, and the residual variant's recall
  * advantage on clustered data (the property the q_pq_recall gate pins).
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clustered(nClusters: Int, per: Int, dim: Int, noise: Float, seed: Long) = {
    spark.range(nClusters.toLong * per).map { i =>
      val c = (i % nClusters).toInt
      val crng = new scala.util.Random(seed * 7919 + c)
      val center = Array.fill(dim)(crng.nextGaussian().toFloat)
      val vrng = new scala.util.Random(seed * 104729 + i)
      (i, center.map(x => x + noise * vrng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("ADC is exact when every vector is a codebook centroid") {
    // 16 distinct centroid vectors, zero noise: PQ reconstruction is exact,
    // so ADC ranking must equal the exact inner-product ranking
    val corpus = clustered(16, 4, 16, noise = 0f, seed = 3).localCheckpoint(true)
    val qs = corpus.where($"vec_id" < 3)
    val cb = Pq.train(corpus, Pq.Params(m = 4, k = 16, iters = 4))
    val codes = Pq.encode(corpus, cb)
    val adc = Pq.adcTopK(qs, codes, cb, topK = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exact = Pq.exactDotTopK(corpus, qs, topK = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // ties among the 4 identical copies per centroid break identically
    // (both rank by (score desc, neighbor_id)), so the sets match exactly
    assert(adc == exact)
  }

  test("encoding is deterministic across partitionings") {
    val corpus = clustered(10, 40, 32, noise = 0.3f, seed = 11).localCheckpoint(true)
    val model = Pq.trainResidual(corpus, Pq.ResidualParams(coarseK = 10, m = 8, k = 32))
    val a = Pq.encodeResidual(corpus, model)
      .as[(Long, Int, Array[Int])].collect().map(r => r._1 -> (r._2, r._3.toSeq)).toMap
    val b = Pq.encodeResidual(corpus.repartition(7), model)
      .as[(Long, Int, Array[Int])].collect().map(r => r._1 -> (r._2, r._3.toSeq)).toMap
    assert(a == b)
    assert(a.values.forall { case (cc, cs) => cc >= 0 && cc < 10 && cs.length == 8 })
  }

  test("residual PQ beats flat PQ on clustered data (gate property)") {
    val corpus = clustered(20, 50, 32, noise = 0.35f, seed = 5).localCheckpoint(true)
    val qs = corpus.where($"vec_id" % 100 === 0)
    val exact = Pq.exactDotTopK(corpus, qs, topK = 10)
      .select($"query_id", $"neighbor_id").localCheckpoint(true)
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count() / 100.0

    val flatCb = Pq.train(corpus, Pq.Params(m = 8, k = 64, iters = 5))
    val flat = recall(Pq.adcTopK(qs, Pq.encode(corpus, flatCb), flatCb, topK = 10)
      .select($"query_id", $"neighbor_id"))

    val model = Pq.trainResidual(corpus, Pq.ResidualParams(coarseK = 20, m = 8, k = 64))
    val resid = recall(Pq.adcTopKResidual(qs, Pq.encodeResidual(corpus, model), model, topK = 10)
      .select($"query_id", $"neighbor_id"))

    assert(resid > flat, s"residual $resid should beat flat $flat")
    assert(resid >= 0.6, s"residual recall $resid too low")
  }

  test("ivfAdcTopK with full probing equals adcTopKResidual; probing prunes") {
    val corpus = clustered(20, 50, 32, noise = 0.35f, seed = 5).localCheckpoint(true)
    val qs = corpus.where($"vec_id" % 200 === 0)
    val model = Pq.trainResidual(corpus, Pq.ResidualParams(coarseK = 20, m = 8, k = 64))
    val codes = Pq.encodeResidual(corpus, model).localCheckpoint(true)
    val full = Pq.adcTopKResidual(qs, codes, model, topK = 10)
      .as[(Long, Long, Long)].collect().toSet
    val probedAll = Pq.ivfAdcTopK(qs, codes, model, topK = 10, nProbe = 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(probedAll == full, "probing every list must equal the full scan")
    // narrow probing still finds the (intra-cluster) exact neighbors
    val exact = Pq.exactDotTopK(corpus, qs, topK = 10)
      .select($"query_id", $"neighbor_id").localCheckpoint(true)
    val probed2 = Pq.ivfAdcTopK(qs, codes, model, topK = 10, nProbe = 4)
      .select($"query_id", $"neighbor_id")
    val recall = probed2.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count() / 50.0
    assert(recall >= 0.5, s"nProbe=4 recall $recall collapsed")
  }

  test("sqEncode: hand-computed codes, constant dims pinned to 0, endpoints clamp") {
    val df = Seq(
      (1L, Array(0f, 10f, 7f)),
      (2L, Array(5f, 5f, 7f)),
      (3L, Array(10f, 0f, 7f))).toDF("vec_id", "embedding")
    val stats = Pq.sqStats(df)
    assert(stats.toSeq == Seq((0.0, 10.0), (0.0, 10.0), (7.0, 7.0)))
    val codes = Pq.sqEncode(df, stats, maxCode = 10)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(1L) == Seq(0, 10, 0)) // min→0, max→maxCode, constant dim→0
    assert(codes(2L) == Seq(5, 5, 0))  // midpoint → mid code
    assert(codes(3L) == Seq(10, 0, 0))
  }

  test("sq round-trip error is within half a quantization step; codes partition-invariant") {
    val corpus = clustered(8, 16, 12, noise = 0.5f, seed = 11).localCheckpoint(true)
    val stats = Pq.sqStats(corpus)
    val codes = Pq.sqEncode(corpus, stats)
    // reconstruction bound: |x − x̂| ≤ (max−min)/(2·255) per dimension
    val joined = Pq.sqDecode(codes, stats)
      .join(corpus, "vec_id")
      .as[(Long, Seq[Float], Seq[Float])].collect()
    joined.foreach { case (_, approx, orig) =>
      orig.indices.foreach { i =>
        val step = (stats(i)._2 - stats(i)._1) / 255.0
        assert(math.abs(orig(i) - approx(i)) <= step / 2 + 1e-9,
          s"dim $i error ${math.abs(orig(i) - approx(i))} exceeds half-step $step")
      }
    }
    // bit-identical codes under a different partitioning
    val again = Pq.sqEncode(corpus.repartition(7), stats)
    assert(codes.exceptAll(again).isEmpty && again.exceptAll(codes).isEmpty)
  }
}
