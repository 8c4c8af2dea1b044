package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Materialized IVF index: build-once layout, result parity with the
  * in-memory path, and — the point of materializing — partition pruning on
  * the cluster column at scan time.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def clusteredCorpus() = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    (0L until 400L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + 0.05f * rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("topK from the index is identical to ivfTopK with the same pivots") {
    import spark.implicits._
    val corpus = clusteredCorpus()
    val queries = corpus.where($"vec_id" < 8)
    val dir = Files.createTempDirectory("graft-ivf").toString
    val nPivots = IvfIndex.build(corpus, dir, Similarity.IvfParams(nPivots = 16))
    assert(nPivots == 16)

    val fromIndex = IvfIndex.topK(spark, dir, queries, k = 10, nProbe = 4)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val pivots = spark.read.parquet(IvfIndex.pivotsPath(dir))
    val inMemory = Similarity.ivfTopK(corpus, queries, k = 10,
        Similarity.IvfParams(nProbe = 4), pivotsOverride = Some(pivots))
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(fromIndex == inMemory)
    assert(fromIndex.nonEmpty)
  }

  test("probe scan prunes partitions to the probed clusters") {
    import spark.implicits._
    val corpus = clusteredCorpus()
    val oneQuery = corpus.where($"vec_id" === 3)
    val dir = Files.createTempDirectory("graft-ivf-prune").toString
    IvfIndex.build(corpus, dir, Similarity.IvfParams(nPivots = 16))

    val result = IvfIndex.topK(spark, dir, oneQuery, k = 5, nProbe = 2)
    result.collect() // execute so AQE finalizes the plan
    // AQE wraps finished subplans in QueryStageExec nodes that .collect does
    // not descend into — walk them explicitly
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(result.queryExecution.executedPlan)
    val vectorScan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("vectors")))
    assert(vectorScan.isDefined, s"no vectors scan in plan:\n${result.queryExecution.executedPlan}")
    // the cluster IN (...) literal must land in partitionFilters (pruning at
    // file-listing time), not dataFilters (post-scan)
    assert(vectorScan.get.partitionFilters.exists(_.references.exists(_.name == "cluster")),
      s"cluster filter not in partitionFilters: ${vectorScan.get.partitionFilters}")
    // nProbe=2 of 16 clusters → the scan touches a strict subset of partitions
    val selected = vectorScan.get.relation.location
      .listFiles(vectorScan.get.partitionFilters, Nil).size
    assert(selected <= 2, s"expected ≤2 probed partitions, scan selected $selected")
  }

  test("append: O(batch) add serves identically to a same-pivot rebuild on the union") {
    import spark.implicits._
    val corpus = clusteredCorpus()
    val base = corpus.where($"vec_id" < 300)
    val batch = corpus.where($"vec_id" >= 300)
    val dir = Files.createTempDirectory("graft-ivf-append").toString
    IvfIndex.build(base, dir, Similarity.IvfParams(nPivots = 16))

    // standing bytes must survive the append untouched (no table rewrite)
    val vdir = new java.io.File(IvfIndex.vectorsPath(dir))
    def files() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(vdir).map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = files()
    val (nStanding, nAppended) = IvfIndex.append(batch, dir)
    assert(nStanding == 300L && nAppended == 100L)
    val after = files()
    assert(before.forall { case (p, ts) => after.get(p).contains(ts) },
      "append rewrote standing files")
    assert(after.size > before.size, "append added no files")

    val queries = corpus.where($"vec_id" < 8)
    val served = IvfIndex.topK(spark, dir, queries, k = 10, nProbe = 4)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val pivots = spark.read.parquet(IvfIndex.pivotsPath(dir))
    val rebuilt = Similarity.ivfTopK(corpus, queries, k = 10,
        Similarity.IvfParams(nProbe = 4), pivotsOverride = Some(pivots))
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(served == rebuilt, "append-then-serve differs from same-pivot rebuild")
    // appended ids are actually reachable
    assert(IvfIndex.topK(spark, dir, corpus.where($"vec_id" === 301), k = 1, nProbe = 1)
      .select($"neighbor_id").as[Long].collect().head == 301L,
      "an appended vector should be its own nearest neighbor")
  }
}
