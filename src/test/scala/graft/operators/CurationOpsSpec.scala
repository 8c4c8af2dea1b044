package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Training-data curation operators: dedup family, similarity search, text
  * analysis. Exact expectations on small planted inputs + recall bounds for
  * the approximate paths vs their exact baselines.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // ------------------------------------------------------------- TextStats

  test("tokenCountCol counts whitespace tokens, blank = 0") {
    val out = docs(1L -> "a b  c", 2L -> "  ", 3L -> "", 4L -> " one ")
      .select($"doc_id", TextStats.tokenCountCol($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("qualityMetrics: ratios and repetition gate") {
    val good = ("the cat sat on the mat with a hat and looked at the dog" +
      " while it was warm in the sun for hours on end").trim
    val repetitive = Array.fill(40)("spam").mkString(" ")
    val m = TextStats.qualityMetrics(docs(1L -> good, 2L -> repetitive))
      .select($"doc_id", $"n_tokens", $"stop_ratio", $"top_token_share", $"quality_ok")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getBoolean(4), "natural text passes")
    assert(!m(2L).getBoolean(4), "40x repeated token fails the repetition gate")
    assert(m(2L).getDouble(3) == 1.0)
    val goodToks = good.split("\\s+")
    assert(m(1L).getLong(1) == goodToks.length)
    val stops = goodToks.count(t => TextStats.Stopwords.contains(t.toLowerCase))
    assert(math.abs(m(1L).getDouble(2) - stops.toDouble / goodToks.length) < 1e-6)
  }

  test("repetitionMetrics: Gopher dup-line and dup-bigram gates") {
    val clean = "alpha beta\ngamma delta\nepsilon zeta"          // no dups
    val dupLines = "same line\nsame line\nsame line\nother line" // 3 of 4 dup
    val dupBigrams = Array.fill(10)("buy now").mkString(" ")     // "now buy"/"buy now" loop
    val one = "single"                                           // 1 token, 1 line
    val m = TextStats.repetitionMetrics(
        docs(1L -> clean, 2L -> dupLines, 3L -> dupBigrams, 4L -> one))
      .select($"doc_id", $"n_lines", $"dup_line_frac", $"n_bigrams",
        $"dup_bigram_frac", $"repetition_ok")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 3 && m(1L).getDouble(2) == 0.0 && m(1L).getBoolean(5))
    // 4 lines, 2 distinct → dup fraction 0.5, fails the 0.30 gate
    assert(m(2L).getLong(1) == 4 && m(2L).getDouble(2) == 0.5 && !m(2L).getBoolean(5))
    // 20 tokens → 19 bigrams, 2 distinct ("buy now", "now buy") → 17/19 dup
    assert(m(3L).getLong(3) == 19)
    assert(math.abs(m(3L).getDouble(4) - (1.0 - 2.0 / 19)) < 1e-6)
    assert(!m(3L).getBoolean(5))
    // degenerate: no bigrams, one line → both fractions 0, passes
    assert(m(4L).getLong(3) == 0 && m(4L).getDouble(4) == 0.0 && m(4L).getBoolean(5))
  }

  test("langIdCol votes by stopword profile") {
    val out = docs(
      1L -> "the cat is in the house and it was for them",
      2L -> "der hund ist nicht mit der katze und das haus",
      3L -> "el perro es en la casa que por una puerta",
      4L -> "le chien est dans la maison pour une porte",
      5L -> "zzz qqq xxx")
      .select($"doc_id", TextStats.langIdCol($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en"); assert(out(2L) == "de")
    assert(out(3L) == "es"); assert(out(4L) == "fr")
    assert(out(5L) == "und")
  }

  test("fingerprint64 is whitespace/case-insensitive, content-sensitive") {
    assert(TextStats.fingerprint64("Hello  World") == TextStats.fingerprint64("hello world "))
    assert(TextStats.fingerprint64("hello world") != TextStats.fingerprint64("hello worlds"))
  }

  // ----------------------------------------------------------------- Dedup

  test("exactGroups + exactDedup keep min-id per digest") {
    val df = docs(3L -> "aaa", 1L -> "aaa", 2L -> "bbb", 5L -> "aaa")
    val groups = Dedup.exactGroups(df).where($"cnt" > 1).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("cnt") == 3)
    assert(groups(0).getAs[Long]("keep_id") == 1L)
    val kept = Dedup.exactDedup(df).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  private val baseText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"

  test("minhashPairs finds near-dups and skips unrelated docs") {
    val df = docs(
      1L -> baseText,
      2L -> (baseText + " omega"), // high jaccard
      3L -> "one two three four five six seven eight nine ten eleven twelve")
    val pairs = Dedup.minhashPairs(df, Dedup.MinHashParams(jaccardThreshold = 0.5))
      .select($"a", $"b").as[(String, String)].collect().toSet
    assert(pairs == Set(("1", "2")))
  }

  test("ngramJaccardPairs computes the exact shingle jaccard") {
    val df = docs(1L -> baseText, 2L -> (baseText + " omega"),
      3L -> "unrelated words entirely different from the others completely")
    val rows = Dedup.ngramJaccardPairs(df, w = 3, threshold = 0.1).collect()
    assert(rows.map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSet == Set(("1", "2")))
    // doc1: 12 3-shingles; doc2: 13; shared 12 → j = 12/13
    assert(math.abs(rows(0).getAs[Double]("jaccard") - 12.0 / 13.0) < 1e-5)
  }

  test("simhashPairs: identical docs at hamming 0, unrelated pruned") {
    val df = docs(1L -> baseText, 2L -> baseText,
      3L -> "unrelated words entirely different from the others completely")
    val pairs = Dedup.simhashPairs(df, maxHamming = 3)
      .select($"a", $"b", $"hamming").collect()
    assert(pairs.map(r => (r.getString(0), r.getString(1))).toSet == Set(("1", "2")))
    assert(pairs(0).getAs[Long]("hamming") == 0L)
  }

  test("embeddingPairs finds high-cosine pairs only") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)), // cos vs 1 ≈ 0.9938
      (3L, Array(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(emb, threshold = 0.95)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semDedup drops the higher-centroid-cos member of each in-cluster dup pair") {
    // cluster 0: vecs 1,2 are near-duplicates (cos ≈ 0.9938); 3 is far from
    // both. Centroid = mean of the three; 1 sits closer to it than 2
    // (centroid cos 0.88396 vs 0.88369 — 2 is the outlier of the pair)
    // → 1 is dropped, 2 and 3 kept.
    // cluster 1: a dup pair would span clusters — 4 ≈ 1 but in cluster 1
    // with nothing near it → kept (SemDeDup never compares across clusters).
    val emb = Seq(
      (1L, 0, Array(1f, 0f, 0f)),
      (2L, 0, Array(0.9f, 0.1f, 0f)),
      (3L, 0, Array(0f, 0f, 1f)),
      (4L, 1, Array(1f, 0.01f, 0f)),
      (5L, 1, Array(0f, 1f, 0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Dedup.semDedup(emb, threshold = 0.95)
      .select($"vec_id", $"is_kept").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true, 5L -> true))
  }

  test("semDedup fails fast on a cluster over maxClusterSize") {
    val emb = (1L to 10L).map(i => (i, 0, Array(i.toFloat, 1f)))
      .toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.semDedup(emb, threshold = 0.9, maxClusterSize = 5).collect()
    }
    assert(e.getMessage.contains("maxClusterSize"))
  }

  // ------------------------------------------------------------ Similarity

  test("bruteForceTopK exact ranks with deterministic tiebreak") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.8f, 0.2f)),
      (3L, Array(0f, 1f)), (4L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(corpus, q, k = 3)
      .select($"rank", $"neighbor_id").as[(Long, Long)].collect().sorted
    // cos: v1=1.0, v4=1.0 (tie → id order), v2≈0.970, v3=0
    assert(got.toSeq == Seq((1L, 1L), (2L, 4L), (3L, 2L)))
  }

  test("ivfTopK achieves high recall vs brute force on clustered vectors") {
    val rng = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextGaussian().toFloat))
    val corpus = (0L until 400L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + 0.05f * rng.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" < 8)
    val k = 10
    val exact = Similarity.bruteForceTopK(corpus, queries, k)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(corpus, queries, k,
      Similarity.IvfParams(nPivots = 16, nProbe = 4))
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall < 0.9")
  }

  test("ppjoinPairs: output equals exact all-pairs Jaccard (prefix filter is lossless)") {
    // 60 docs over a small vocabulary → dense overlap structure with pairs
    // on both sides of the threshold, including exact boundary values
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val docs = (0 until 60).map { i =>
      val n = 6 + (i % 5)
      (i.toLong, (0 until n).map(j => vocab((i * 3 + j * 5) % vocab.length)).mkString(" "))
    }.toDF("doc_id", "text")
    val t = 0.4
    val got = Dedup.ppjoinPairs(docs, w = 3, threshold = t)
      .as[(String, String, Double)].collect().map(r => (r._1, r._2)).toSet
    // ground truth: brute-force exact Jaccard over the same string shingles
    def sh(s: String): Set[String] = {
      val tk = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.isEmpty) Set.empty
      else if (tk.length < 3) Set(tk.mkString("\u0001"))
      else (0 to tk.length - 3).map(i => tk.slice(i, i + 3).mkString("\u0001")).toSet
    }
    val rows = docs.as[(Long, String)].collect().map { case (id, s) => (id.toString, sh(s)) }
    val expected = (for {
      (a, sa) <- rows; (b, sb) <- rows
      if a < b && sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / (sa.size + sb.size - sa.intersect(sb).size)
      jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= t
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "test corpus must produce qualifying pairs")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("containmentPairs: a quoted subset scores 1.0 one way, below threshold the other") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val article = s"intro words before the quote $quote and then a very long tail " +
      "of completely unrelated article prose continuing for many more tokens here"
    val df = docs(1L -> quote, 2L -> article,
      3L -> "entirely different text with no overlap at all whatsoever really")
    val got = Dedup.containmentPairs(df, w = 3, threshold = 0.9)
      .as[(String, String, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set(("1", "2")),
      s"only quote-in-article qualifies, got ${got.toSeq}")
    assert(got.head._3 == 1.0, "every shingle of the quote appears in the article")
    // the reverse direction exists but far below 0.9
    val all = Dedup.containmentPairs(df, w = 3, threshold = 0.01)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(all(("2", "1")) < 0.5 && all(("2", "1")) > 0.0)
  }

  test("centroids: exact mean pool, bit-identical across partitionings") {
    import graft.extract.Embeddings
    val rows = Seq(
      (1L, 0, Array(1.0f, 2.0f)), (2L, 0, Array(3.0f, 4.0f)), (3L, 0, Array(5.0f, 6.0f)),
      (4L, 1, Array(10.0f, 0.0f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val out = Embeddings.centroids(df, "label", "vec_id")
      .select($"label", $"centroid").as[(Int, Array[Double])].collect().toMap
    assert(out(0).toSeq == Seq(3.0, 4.0) && out(1).toSeq == Seq(10.0, 0.0))
    // partition invariance of the double fold: 1 vs 8 partitions, same bits
    val a = Embeddings.centroids(df.repartition(1), "label", "vec_id")
      .select($"label", $"norm", $"c0").as[(Int, Double, Double)].collect().toSet
    val b = Embeddings.centroids(df.repartition(8), "label", "vec_id")
      .select($"label", $"norm", $"c0").as[(Int, Double, Double)].collect().toSet
    assert(a == b)
  }

  test("randomProject: JL norms concentrate near 1, exact hand fold, partition-invariant bits") {
    import graft.extract.Embeddings
    import graft.operators.TextStats
    val dim = 32
    val df = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 31 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val proj = Embeddings.randomProject(df, dim = dim, k = 16)
    // norm preservation in the JL sense: mean squared-norm ratio near 1
    val ratios = proj.join(df, "vec_id")
      .as[(Long, Seq[Double], Seq[Float])].collect().map { case (_, y, x) =>
        y.map(v => v * v).sum / x.map(v => v.toDouble * v).sum
      }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.15, s"mean norm ratio $mean drifted")
    // exact hand fold for one row: same signs, same order, same bits
    val x0 = df.where($"vec_id" === 0L).as[(Long, Seq[Float])].collect().head._2
    val expected0 = (0 until dim).foldLeft(0.0) { (acc, i) =>
      val s =
        if ((java.lang.Long.bitCount(TextStats.fingerprint64(s"0:$i")) & 1) == 0) 1.0
        else -1.0
      acc + x0(i).toDouble * s
    } / math.sqrt(16.0)
    val got0 = proj.where($"vec_id" === 0L)
      .as[(Long, Seq[Double])].collect().head._2.head
    assert(got0 == expected0, s"bit drift: $got0 != $expected0")
    // bit-identical under a different partitioning
    val again = Embeddings.randomProject(df.repartition(7), dim = dim, k = 16)
    assert(proj.exceptAll(again).isEmpty && again.exceptAll(proj).isEmpty)
  }

  test("termStats: top-k by tf with df, deterministic tie-break") {
    val df = Seq(
      (1L, "the cat and the dog"),
      (2L, "THE cat runs"),
      (3L, "zebra apple")).toDF("doc_id", "text")
    val out = TextStats.termStats(df, k = 3).as[(String, Long, Long)].collect()
    assert(out(0) == (("the", 3L, 2L))) // case-folded, tf 3 across 2 docs
    assert(out(1) == (("cat", 2L, 2L)))
    // tf=1 tie broken by token asc: "and" < "apple" < ...
    assert(out(2) == (("and", 1L, 1L)))
  }

  test("substringDupStats: shared windows found, interval union merges overlaps, clean docs zero") {
    // docs 1 and 2 share tokens a1..a10 (10 tokens) at different offsets;
    // doc 3 is clean; window w=4
    val shared = (1 to 10).map(i => s"a$i").mkString(" ")
    val df = Seq(
      (1L, s"$shared x1 x2 x3"),
      (2L, s"y1 y2 $shared"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val out = Dedup.substringDupStats(df, windowTokens = 4)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Double)].collect()
    // doc 1: windows at pos 1..7 over a1..a10 are shared (7 windows);
    // union covers a1..a10 = 10 tokens of 13
    assert(out(0) == ((1L, 13L, 7L, 10L, 10.0 / 13.0)))
    // doc 2: same 7 windows at pos 3..9, covering 10 of 12 tokens
    assert(out(1) == ((2L, 12L, 7L, 10L, 10.0 / 12.0)))
    assert(out(2) == ((3L, 8L, 0L, 0L, 0.0)))
  }

  test("bloomNewDocs: no false negatives vs exact anti-join, bounded false-positive drops") {
    // history 0..999; batch 1000..1499 where every third doc repeats a
    // history text — those must NEVER survive the bloom probe
    val history = (0L until 1000L).map(i => (i, s"history document number $i")).toDF("doc_id", "text")
    val batch = (1000L until 1500L).map { i =>
      val text = if (i % 3 == 0) s"history document number ${i % 1000}" else s"fresh document $i"
      (i, text)
    }.toDF("doc_id", "text")
    val bloomNew = Dedup.bloomNewDocs(history, batch, fpp = 0.01)
      .select($"doc_id").as[Long].collect().toSet
    val exactNew = batch.join(
        history.select(md5($"text".cast("binary")).as("digest")),
        md5($"text".cast("binary")) === $"digest", "left_anti")
      .select($"doc_id").as[Long].collect().toSet
    assert(bloomNew.subsetOf(exactNew), "bloom re-admitted a true duplicate (false negative)")
    val dropped = exactNew -- bloomNew
    assert(dropped.size <= 5 + 0.05 * exactNew.size,
      s"bloom dropped ${dropped.size} of ${exactNew.size} genuinely-new docs — fpp far above 1%")
  }

  // ------------------------------------------------------ survivor selection

  test("canonicalDocs keeps argmax quality per cluster, ties to min id, loners pass") {
    val d = docs(
      1L -> "short copy",           // cluster c1, 2 tokens
      2L -> "longer copy of it",    // cluster c1, 4 tokens -> survivor
      3L -> "tie one two",          // cluster c2, 3 tokens, id 3 < 4 -> survivor
      4L -> "tie uno dos",          // cluster c2, 3 tokens
      5L -> "independent document") // no cluster -> kept
    val clusters = Seq(("1", "c1"), ("2", "c1"), ("3", "c2"), ("4", "c2"))
      .toDF("doc_id", "cluster_id")
    val out = Dedup.canonicalDocs(d, clusters, TextStats.tokenCountCol($"text"))
      .as[(String, Option[String], Boolean)].collect().toSet
    assert(out == Set(
      ("1", Some("c1"), false), ("2", Some("c1"), true),
      ("3", Some("c2"), true), ("4", Some("c2"), false),
      ("5", None, true)))
  }

  test("canonicalDocs survivor set is partition-count invariant") {
    val d = docs((1L to 40L).map(i =>
      i -> (s"cluster${i % 5} " + ("w " * (i % 7).toInt).trim)): _*)
    val clusters = (1L to 40L).map(i => (i.toString, s"c${i % 5}"))
      .toDF("doc_id", "cluster_id")
    def run(parts: Int) =
      Dedup.canonicalDocs(d.repartition(parts), clusters.repartition(parts),
          TextStats.tokenCountCol($"text"))
        .where($"kept").select($"doc_id")
        .as[String].collect().toSet
    assert(run(1) == run(13))
    assert(run(13).size == 5)
  }
}
