package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale training-data curation over a
  * `documents(doc_id, text, ...)`-shaped table.
  *
  * Scale design notes (the part that matters at 100 TB):
  *   - exact dedup is one hash-shuffle on a 16-byte digest — the only wide op;
  *     map-side partial aggregation collapses per-partition duplicates first.
  *   - MinHash/SimHash signatures are narrow per-row computations; candidate
  *     generation shuffles on (band, signature) buckets, NOT on all-pairs —
  *     O(docs × bands) rows instead of O(docs²). Oversized buckets (boiler-
  *     plate floods) are dropped with a window count, the standard guard.
  *   - pair verification joins only same-bucket candidates back to their
  *     feature sets; with `spark.sql.adaptive.enabled` skew-split handles any
  *     residual hot bucket.
  */
object Dedup {

  // ------------------------------------------------------------------ exact

  /** Exact-duplicate groups by content digest: one row per distinct digest
    * with its member count and the deterministic keeper (min doc_id).
    * md5 is a codegen'd built-in; the groupBy is the only shuffle.
    */
  def exactGroups(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("fingerprint"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))

  /** Survivors of exact dedup: the min-id row per digest. */
  def exactDedup(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol).cast("binary"))).orderBy(col(idCol))
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  // ------------------------------------------------------- shingles/minhash

  /** Word w-shingles of the lowercased token stream, as murmur3 ints. */
  def shingles(text: String, w: Int): Array[Int] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) {
      if (toks.isEmpty) Array.empty else Array(MurmurHash3.arrayHash(toks.asInstanceOf[Array[AnyRef]]))
    } else {
      val out = new Array[Int](toks.length - w + 1)
      var i = 0
      while (i + w <= toks.length) {
        var h = MurmurHash3.stringHash(toks(i), 0x9747b28c)
        var j = 1
        while (j < w) { h = MurmurHash3.mix(h, MurmurHash3.stringHash(toks(i + j), 0x9747b28c)); j += 1 }
        out(i) = MurmurHash3.finalizeHash(h, w)
        i += 1
      }
      out
    }
  }

  /** MinHash signature: numPerm permutations via the (a*x+b) mod p trick. */
  def minhashSig(sh: Array[Int], numPerm: Int, seed: Int): Array[Long] = {
    val P = 2305843009213693951L // 2^61 - 1
    val rng = new scala.util.Random(seed)
    val as = Array.fill(numPerm)(1L + (math.abs(rng.nextLong()) % (P - 1)))
    val bs = Array.fill(numPerm)(math.abs(rng.nextLong()) % P)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val x = sh(i) & 0xffffffffL
      var k = 0
      while (k < numPerm) {
        val v = (as(k) * x + bs(k)) % P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }

  final case class MinHashParams(
      shingleW: Int = 3,
      numPerm: Int = 128,
      bands: Int = 16,
      jaccardThreshold: Double = 0.8,
      maxBucket: Int = 1000,
      seed: Int = 42) {
    require(numPerm % bands == 0, "bands must divide numPerm")
    def rowsPerBand: Int = numPerm / bands
  }

  /** Near-duplicate pairs by MinHash + banded LSH, verified with the exact
    * shingle-set Jaccard ≥ threshold. Output: (a, b, jaccard) with a < b.
    *
    * Stages: per-row signature (narrow) → explode to (band, bandSig) →
    * bucket self-join (shuffle on the band key) → exact verify on candidate
    * pairs only. This is the MinHashLSH algorithm in plain Datasets — kept
    * out of MLlib so the shingling/seeding is deterministic and the band
    * layout is explicit (MLlib's OR-amplification has no banding control).
    */
  def minhashPairs(df: DataFrame, p: MinHashParams = MinHashParams(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = p.shingleW; val nPerm = p.numPerm; val bands = p.bands
    val rpb = p.rowsPerBand; val seed = p.seed

    val sigs = df.select(col(idCol).cast("string").as("id"), col(textCol).as("t"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val sh = shingles(text, w)
          (id, sh, minhashSig(sh, nPerm, seed))
        }
      }
      .toDF("id", "shingles", "sig")

    val banded = sigs.select(col("id"), col("shingles"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> hash(slice(sig, b * $rpb + 1, $rpb)))"))
          .as(Seq("band", "band_sig")))

    val pruned = banded
      .withColumn("bn", count(lit(1)).over(Window.partitionBy($"band", $"band_sig")))
      .where($"bn" <= p.maxBucket)

    val l = pruned.select($"band", $"band_sig", $"id".as("a"), $"shingles".as("sh_a"))
    val r = pruned.select($"band", $"band_sig", $"id".as("b"), $"shingles".as("sh_b"))
    val cands = l.join(r, Seq("band", "band_sig"))
      .where($"a" < $"b")
      .select($"a", $"b", $"sh_a", $"sh_b")
      .dropDuplicates("a", "b")

    cands
      .withColumn("jaccard", round(
        size(array_intersect(array_distinct($"sh_a"), array_distinct($"sh_b"))).cast("double") /
          size(array_union($"sh_a", $"sh_b")), 6))
      .where($"jaccard" >= p.jaccardThreshold)
      .select($"a", $"b", $"jaccard")
  }

  // ---------------------------------------------------------------- simhash

  /** 64-bit SimHash over token murmur hashes (unit weights). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    val toks = text.toLowerCase.split("\\s+")
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = (MurmurHash3.stringHash(toks(i), 0x1234abcd).toLong << 32) |
          (MurmurHash3.stringHash(toks(i), 0x9e3779b9) & 0xffffffffL)
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1; b += 1 }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  val simhashUdf = udf((s: String) => simhash64(s))

  /** Near-duplicate pairs with Hamming distance ≤ maxHamming, blocked by the
    * pigeonhole principle: split the 64-bit signature into maxHamming+1
    * chunks — any pair within distance k must agree on ≥1 chunk exactly, so
    * the self-join runs per (chunk index, chunk value) bucket only.
    */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nChunks = maxHamming + 1
    val bitsPer = 64 / nChunks

    val sigs = df.select(col(idCol).cast("string").as("id"),
      simhashUdf(col(textCol)).as("sig"))

    val chunked = sigs.select($"id", $"sig",
      posexplode(expr(
        s"transform(sequence(0, ${nChunks - 1}), c -> (sig >> (c * $bitsPer)) & ${(1L << bitsPer) - 1})"))
        .as(Seq("chunk", "chunk_val")))

    val l = chunked.select($"chunk", $"chunk_val", $"id".as("a"), $"sig".as("sig_a"))
    val r = chunked.select($"chunk", $"chunk_val", $"id".as("b"), $"sig".as("sig_b"))
    // hamming filter BEFORE the pair dedup: bit_count on two longs is
    // codegen'd and nearly free, while dropDuplicates shuffles every row it
    // sees — filtering first shrinks the dedup input by orders of magnitude
    l.join(r, Seq("chunk", "chunk_val"))
      .where($"a" < $"b")
      .select($"a", $"b", expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
      .where($"hamming" <= maxHamming)
      .dropDuplicates("a", "b")
  }

  // ------------------------------------------------- n-gram Jaccard (exact)

  /** Exact n-gram Jaccard similarity for all pairs above a threshold, via an
    * inverted index (posting-list join) rather than a cross join: explode
    * distinct shingles, join on shingle, count shared shingles per pair,
    * then |A∩B| / (|A| + |B| − |A∩B|). Prunes by document-frequency cap to
    * keep posting lists bounded (stopword-shingle floods).
    */
  def ngramJaccardPairs(df: DataFrame, w: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Int = 1000, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val shingleUdf = udf((s: String) => shingles(s, w).distinct)
    val exploded = df.select(col(idCol).cast("string").as("id"),
        explode(shingleUdf(col(textCol))).as("sh"))
    val sizes = exploded.groupBy($"id").agg(count(lit(1)).as("sz"))

    val filtered = exploded
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"sh")))
      .where($"df" <= maxDocFreq)

    val pairsShared = filtered.as("x").join(filtered.as("y"), "sh")
      .where($"x.id" < $"y.id")
      .groupBy($"x.id".as("a"), $"y.id".as("b"))
      .agg(count(lit(1)).as("shared"))

    pairsShared
      .join(sizes.select($"id".as("a"), $"sz".as("sz_a")), "a")
      .join(sizes.select($"id".as("b"), $"sz".as("sz_b")), "b")
      .withColumn("jaccard",
        round($"shared".cast("double") / ($"sz_a" + $"sz_b" - $"shared"), 6))
      .where($"jaccard" >= threshold)
      .select($"a", $"b", $"jaccard")
  }

  // ------------------------------------------- embedding-cosine near-dup

  /** Near-duplicate pairs by embedding cosine ≥ threshold — EXACT all-pairs,
    * computed as a broadcast block scan: the (id, vector) list is broadcast
    * (bounded — refuse beyond `maxBroadcastRows`), and each partition scans
    * its rows against all higher-id vectors with a primitive loop. This is
    * the dense half of a block matrix multiply: N²/2 fused multiply-adds
    * with zero join machinery and zero per-pair allocation — ~100x faster
    * than a nested-loop join evaluating a UDF per pair.
    *
    * Beyond `maxBroadcastRows` exactness is off the table anyway at this
    * cost model — use sign-RP LSH blocking + exact verify on candidates
    * (graft.resolve.Resolution.candidatePairs), trading bounded recall for
    * O(rows × bands) shuffle.
    */
  def embeddingPairs(embeddings: DataFrame, threshold: Double = 0.95,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxBroadcastRows: Int = 200000): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val rows = embeddings.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
    val all = rows.collect().sortBy(_._1)
    require(all.length <= maxBroadcastRows,
      s"${all.length} rows exceed the exact-scan bound $maxBroadcastRows; " +
        "use LSH blocking (Resolution.candidatePairs) at this scale")
    val bc = spark.sparkContext.broadcast(all)
    val thr = threshold
    rows.mapPartitions { it =>
      val ref = bc.value
      it.flatMap { case (id, v) =>
        // binary search the first index with id' > id
        var lo = 0; var hi = ref.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ref(mid)._1 <= id) lo = mid + 1 else hi = mid
        }
        Iterator.range(lo, ref.length).flatMap { j =>
          val (jid, w) = ref(j)
          var d = 0.0; var na = 0.0; var nb = 0.0
          val n = math.min(v.length, w.length)
          var i = 0
          while (i < n) {
            val x = v(i).toDouble; val y = w(i).toDouble
            d += x * y; na += x * x; nb += y * y
            i += 1
          }
          val cos = if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
          if (cos >= thr) Some((id, jid, cos)) else None
        }
      }
    }.toDF("a", "b", "cos")
      .select($"a", $"b", round($"cos", 6).as("cos"))
  }
}
