package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Corpus-curation operators (Curation): decontamination, deterministic
  * sampling, quantile binning, sequence packing — exact expectations on
  * planted inputs, plus determinism across partitionings.
  */
class CurationSamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("ngramsCol: distinct sliding windows, short text empty") {
    val out = docs(
        1L -> "A b c d",
        2L -> "x y",
        3L -> "r r r r")
      .select($"doc_id", Curation.ngramsCol($"text", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L).isEmpty, "below n tokens yields no grams")
    assert(out(3L) == Seq("r r r"), "duplicates are deduped")
  }

  test("decontaminate flags exactly the docs sharing an n-gram with bench") {
    val shared = "one two three four five six seven eight"
    val bench = docs(100L -> s"intro $shared outro")
    val train = docs(
      1L -> s"prefix $shared suffix", // contaminated (the 8-gram itself)
      2L -> "totally different words that never overlap with anything here",
      3L -> "one two three four five SIX seven eight") // case-folded match
    val hits = Curation.decontaminate(train, bench, n = 8)
      .as[(Long, Long)].collect().toMap
    assert(hits.keySet == Set(1L, 3L))
    assert(hits(3L) == 1L)
  }

  test("hashBucketCol matches fingerprint64 pmod and is partition-invariant") {
    val df = spark.range(0, 500).toDF("doc_id")
    val got = df.select($"doc_id", Curation.hashBucketCol($"doc_id", 100).as("b"))
      .as[(Long, Long)].collect().toMap
    (0L until 500L).foreach { i =>
      val h = TextStats.fingerprint64(i.toString)
      val expect = ((h % 100) + 100) % 100
      assert(got(i) == expect, s"doc $i")
    }
    val re = df.repartition(7).select(Curation.hashBucketCol($"doc_id", 100).as("b"))
      .agg(sum($"b")).as[Long].head()
    assert(re == got.values.sum)
  }

  test("stratifiedSample keeps ~rate% per stratum, deterministically") {
    val df = spark.range(0, 2000)
      .select($"id".as("doc_id"),
        when(pmod($"id", lit(2)) === 0, "en").otherwise("zh").as("lang"))
    val kept = Curation.stratifiedSample(df, "lang", "doc_id",
      Map("en" -> 80, "zh" -> 25), defaultPct = 50)
    val byLang = kept.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") > 700 && byLang("en") < 900, s"en=${byLang("en")}")
    assert(byLang("zh") > 180 && byLang("zh") < 330, s"zh=${byLang("zh")}")
    // identical rows on a rerun with different parallelism
    val again = Curation.stratifiedSample(df.repartition(13), "lang", "doc_id",
      Map("en" -> 80, "zh" -> 25), defaultPct = 50)
    assert(again.select("doc_id").except(kept.select("doc_id")).isEmpty)
    assert(kept.select("doc_id").except(again.select("doc_id")).isEmpty)
  }

  test("quantileBins: ntile bins partition the stratum in value order") {
    val df = (1L to 20L).map(i => (i, "en", i * 10)).toDF("doc_id", "lang", "n_chars")
      .unionByName((1L to 7L).map(i => (100 + i, "de", i)).toDF("doc_id", "lang", "n_chars"))
    val bins = Curation.quantileBins(df, "lang", "n_chars", "doc_id", nBins = 4)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(bins(("en", 1L)) == ((5L, 10L, 50L)))
    assert(bins(("en", 4L)) == ((5L, 160L, 200L)))
    // 7 rows into 4 bins: sizes 2,2,2,1
    assert(bins(("de", 1L))._1 == 2L && bins(("de", 4L))._1 == 1L)
    // bins tile the stratum: next bin's lo follows prev bin's hi
    assert(bins(("en", 2L))._2 > bins(("en", 1L))._3)
  }

  test("dedupLines removes cross-doc repeated lines, keeps order and blanks") {
    val footer = "subscribe to our newsletter"
    val df = docs(
      1L -> s"alpha one\n$footer\nbeta two",
      2L -> s"gamma three\n\n$footer",
      3L -> footer) // fully boilerplate
    val out = Curation.dedupLines(df)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((3L, 2L, "alpha one\nbeta two")))
    assert(out(2L) == ((3L, 2L, "gamma three\n")), "blank lines survive")
    assert(out(3L) == ((1L, 0L, "")), "fully-boilerplate doc kept with empty text")
    // a line repeated within ONE doc is not boilerplate
    val within = Curation.dedupLines(docs(9L -> "same\nsame"))
      .as[(Long, Long, Long, String)].head()
    assert(within == ((9L, 2L, 2L, "same\nsame")))
  }

  test("packContiguous: docs fall in the pack holding their start offset") {
    // 5 docs of 3 tokens each, budget 7: offsets 0,3,6,9,12 -> packs 0,0,0,1,1
    val df = (1L to 5L).map(i => (i, "s0", "a b c")).toDF("doc_id", "source", "text")
    val packs = Curation.packContiguous(df, "source", "doc_id", "text", budgetTokens = 7)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(packs(("s0", 0L)) == ((3L, 9L)))
    assert(packs(("s0", 1L)) == ((2L, 6L)))
  }

  test("c4Clean applies the C4 line and document rules") {
    val good = "This is a fine sentence with words."
    val df = Seq(
      (1L, s"$good\n$good\n$good"),                            // 3 good lines → keep
      (2L, s"$good\nno terminal punctuation here\n$good"),     // 2 kept → drop
      (3L, s"$good\nShort line.\n$good\n$good"),               // <5 words line dropped, doc kept
      (4L, s"$good\nPlease enable JavaScript to see this.\n$good\n$good"), // js line out
      (5L, s"$good\n$good\n$good\nlorem ipsum dolor sit."),    // lorem → drop doc
      (6L, s"$good\n$good\n$good\nvar x = { };")               // brace → drop doc
    ).toDF("doc_id", "text")
    val out = Curation.c4Clean(df).orderBy("doc_id")
      .as[(Long, Long, Long, Boolean, String)].collect()
    assert(out(0) == ((1L, 3L, 3L, true, s"$good\n$good\n$good")))
    assert(out(1)._3 == 2L && !out(1)._4)
    assert(out(2) == ((3L, 4L, 3L, true, s"$good\n$good\n$good")))
    assert(out(3)._3 == 3L && out(3)._4 && !out(3)._5.toLowerCase.contains("javascript"))
    assert(!out(4)._4 && !out(5)._4) // lorem ipsum / brace pages dropped
  }

  test("blocklistFilter: exact token matches, first offender, keep verdict") {
    val df = Seq(
      (1L, "clean words only here"),                 // no hits → keep
      (2L, "the BADWORD appears once"),              // case-folded hit
      (3L, "badword then also verboten and badword"),// 3 hits, first in doc order
      (4L, "embedbadword is not a token match"),     // substring must NOT flag
      (5L, "")                                       // empty doc → keep, 0 tokens
    ).toDF("doc_id", "text")
    val out = Curation.blocklistFilter(df, Seq("badword", "VERBOTEN"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, String, Boolean)].collect()
    assert(out(0) == ((1L, 4L, 0L, "", true)))
    assert(out(1) == ((2L, 4L, 1L, "badword", false)))
    assert(out(2) == ((3L, 6L, 3L, "badword", false)), "all hits counted, first in doc order")
    assert(out(3) == ((4L, 6L, 0L, "", true)), "token-exact: substrings never flag")
    assert(out(4) == ((5L, 0L, 0L, "", true)))
  }

  test("weightedSample: weight-proportional inclusion, partition-invariant, exact race key") {
    val df = (0 until 1000).map(i => (i.toLong, if (i % 2 == 0) 100.0 else 1.0))
      .toDF("doc_id", "w")
    val s = Curation.weightedSample(df, 200, "w").localCheckpoint(true)
    val evens = s.where($"doc_id" % 2 === 0).count()
    assert(evens > 150, s"evens $evens of 200 — weight-proportional inclusion broken")
    val again = Curation.weightedSample(df.repartition(9), 200, "w")
    assert(s.select("doc_id").exceptAll(again.select("doc_id")).isEmpty &&
      again.select("doc_id").exceptAll(s.select("doc_id")).isEmpty)
    // zero-weight rows never win; n beyond the corpus keeps the rest
    val small = Seq((1L, 5.0), (2L, 0.0), (3L, 1.0)).toDF("doc_id", "w")
    val all = Curation.weightedSample(small, 10, "w")
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 3L))
    // race key recomputed by hand for one row
    val h = graft.operators.TextStats.fingerprint64("1")
    val b = ((h % 1000000000L) + 1000000000L) % 1000000000L
    val expected = BigDecimal(-math.log((b + 0.5) / 1.0e9) / 5.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Curation.weightedSample(small, 10, "w")
      .where($"doc_id" === 1L).select("es_key").as[Double].collect().head
    assert(got == expected, s"$got != $expected")
  }

  test("temperatureRates: α=0.5 weights, ppm floor, cap at 1e6; sample honors the rates") {
    // strata: a=400 docs, b=100, c=4 → √n = 20, 10, 2; Σ√n = 32
    val df = ((0 until 400).map(i => (i.toLong, "a")) ++
      (1000 until 1100).map(i => (i.toLong, "b")) ++
      (2000 until 2004).map(i => (i.toLong, "c"))).toDF("doc_id", "stratum")
    val rates = Curation.temperatureRates(df, "stratum", targetTotal = 64)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rates("a") == ((400L, math.floor(1e6 * 64.0 * 20 / 32 / 400).toLong))) // 100000 ppm
    assert(rates("b") == ((100L, math.floor(1e6 * 64.0 * 10 / 32 / 100).toLong))) // 200000 ppm
    assert(rates("c") == ((4L, 1000000L))) // capped: 64·2/32/4 = 1.0 → 1e6
    // the flattening property: rarer strata sample at a HIGHER rate
    assert(rates("a")._2 < rates("b")._2 && rates("b")._2 < rates("c")._2)

    val ratesDf = Curation.temperatureRates(df, "stratum", targetTotal = 64)
    val sampled = Curation.temperatureSample(df, ratesDf, "stratum", "doc_id")
    // every kept row's bucket is under its stratum's rate, and rerunning
    // yields the identical sample (hash determinism)
    val again = Curation.temperatureSample(df, ratesDf, "stratum", "doc_id")
    assert(sampled.exceptAll(again).isEmpty && again.exceptAll(sampled).isEmpty)
    val all4 = sampled.where($"stratum" === "c").count()
    assert(all4 == 4L) // rate 1e6 keeps everything
  }

  test("lmPerplexityBuckets: fluent docs head, gibberish tail, partition-invariant") {
    val fluent = "the quick brown fox jumps over the lazy dog again"
    val mixed = "the quick brown fox visits strange glowing portals now maybe"
    // 24 scored docs → ntile(3) buckets of exactly 8: the three fluency
    // tiers land one-per-bucket iff the score ordering is right
    val corpus =
      (0L until 8L).map(i => (i, "en", fluent)) ++             // train = fluent eval
        (8L until 16L).map(i => (i, "en", mixed)) ++           // prefix seen
        (16L until 24L).map(i =>                               // all unseen
          (i, "en", s"zxq$i wvu$i tsr$i qpo$i nml$i kji$i hgf$i edc$i")) :+
        ((99L, "en", "solo")) // single token: no bigrams, excluded
    val df = corpus.toDF("doc_id", "lang", "text")
    val out = Curation.lmPerplexityBuckets(df, df.where($"doc_id" < 8))
      .select($"doc_id", $"ppl_bucket").as[(Long, Long)].collect().toMap
    assert(!out.contains(99L), "sub-bigram docs are excluded")
    assert(out.size == 24)
    (0L until 8L).foreach(i => assert(out(i) == 1L, s"fluent doc $i in head"))
    (8L until 16L).foreach(i => assert(out(i) == 2L, s"mixed doc $i in middle"))
    (16L until 24L).foreach(i => assert(out(i) == 3L, s"gibberish doc $i in tail"))
    // bucket assignment survives repartitioning (the rounded-score boundary)
    val re = Curation.lmPerplexityBuckets(df.repartition(7), df.where($"doc_id" < 8))
      .select($"doc_id", $"ppl_bucket").as[(Long, Long)].collect().toMap
    assert(re == out)
  }

  test("dsirWeights: target-like docs outrank off-target, ranks 1..K, partition-invariant") {
    val catty = "cats purr and cats nap in warm sun all day long"
    val traffic = "highway traffic jam delays commute for many angry drivers today"
    val corpus =
      (0L until 6L).map(i => (i, "en", catty)) ++        // target slice (lang=en)
        (10L until 16L).map(i => (i, "xx", catty)) ++    // raw, target-like
        (20L until 26L).map(i => (i, "xx", traffic)) :+  // raw, off-target
        ((99L, "xx", "   ")) // zero tokens: excluded entirely
    val df = corpus.toDF("doc_id", "lang", "text")
    val out = Curation.dsirWeights(df, df.where($"lang" === "en"), selectK = 12)
      .select($"doc_id", $"n_feats", $"rank", $"selected")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(!byId.contains(99L), "token-less docs are excluded")
    assert(out.length == 18)
    // n_feats = tokens + bigrams: catty 11+10, traffic 10+9
    assert(out.forall(r => r._2 == (if (r._1 >= 20L) 19L else 21L)))
    // every catty raw doc (and the target copies, which are also raw rows)
    // must outrank every traffic doc: the 12 selected = the 12 catty docs
    val selected = out.filter(_._4).map(_._1).toSet
    assert(selected == ((0L until 6L) ++ (10L until 16L)).toSet)
    assert(out.filter(_._4).flatMap(_._3).sorted.toSeq == (1L to 12L))
    assert(out.filterNot(_._4).forall(_._3.isEmpty), "unselected rank is null")
    val re = Curation.dsirWeights(df.repartition(7), df.where($"lang" === "en"), selectK = 12)
      .select($"doc_id", $"rank").as[(Long, Option[Long])].collect().toMap
    assert(re == out.map(r => r._1 -> r._3).toMap, "rank survives repartitioning")
  }

  test("shuffleShards: total permutation, deterministic, seed-sensitive, partition-invariant") {
    val df = (0L until 200L).map(i => (i, s"tok$i words here")).toDF("doc_id", "text")
    val out = Curation.shuffleShards(df, "doc_id", "text", nShards = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 200, "every doc is assigned exactly once")
    assert(out.map(_._2).toSet.subsetOf((0L until 4L).toSet))
    // positions are 1..n contiguous within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
    }
    // expected assignment from the scalar fingerprint — the column replica
    // must agree with the reference JVM implementation byte-for-byte
    out.foreach { case (id, shard, _, _) =>
      val h = TextStats.fingerprint64(s"$id:s0")
      assert(((h % 4) + 4) % 4 == shard, s"doc $id shard mismatch")
    }
    val rerun = Curation.shuffleShards(df.repartition(13), "doc_id", "text", nShards = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(rerun.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq,
      "assignment is partition-invariant")
    val otherSeed = Curation.shuffleShards(df, "doc_id", "text", nShards = 4, seed = "s1")
      .as[(Long, Long, Long, Long)].collect()
    assert(otherSeed.sortBy(_._1).map(r => (r._2, r._3)).toSeq !=
      out.sortBy(_._1).map(r => (r._2, r._3)).toSeq,
      "a different seed yields a different permutation")
  }

  test("shardManifest: counts/tokens per shard; digest flips on reorder and drop") {
    val df = (0L until 60L).map(i => (i, "three plain tokens")).toDF("doc_id", "text")
    val shards = Curation.shuffleShards(df, "doc_id", "text", nShards = 3)
    val m = Curation.shardManifest(shards, "doc_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(m.map(_._2).sum == 60, "doc counts cover the corpus")
    assert(m.forall(_._3 > 0), "token sums are positive")
    // swapping two docs' positions inside one shard must flip that shard's
    // digest (xor alone would not see a reorder; pos:id terms do)
    val shard0 = shards.where($"shard_id" === 0)
    val swapped = shard0.withColumn("pos",
      when($"pos" === 1L, 2L).when($"pos" === 2L, 1L).otherwise($"pos"))
    val d0 = Curation.shardManifest(shard0, "doc_id").as[(Long, Long, Long, Long)].collect()
    val d0s = Curation.shardManifest(swapped, "doc_id").as[(Long, Long, Long, Long)].collect()
    assert(d0.head._4 != d0s.head._4, "reorder flips the digest")
    val dropped = Curation.shardManifest(shard0.where($"pos" =!= 1L), "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(d0.head._4 != dropped.head._4, "a dropped row flips the digest")
  }
}
