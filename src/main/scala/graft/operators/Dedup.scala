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

  /** Per-permutation salt constants for [[minhashSig]] — a pure function of
    * (numPerm, seed), computed ONCE (driver side, shipped in the closure),
    * never per row (r1 reallocated them per document).
    */
  def minhashSeeds(numPerm: Int, seed: Int): Array[Long] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPerm)(rng.nextLong())
  }

  /** splitmix64 finalizer — a bijective 64-bit mixer. Salted with a per-
    * permutation constant it behaves as an independent random permutation of
    * the shingle universe, which is exactly the min-wise-independence MinHash
    * needs. (r1 used (a·x+b) mod 2^61−1 with a < 2^30 over 32-bit inputs:
    * barely one modular wrap, so the "permutation" was order-preserving
    * almost everywhere and slot-agreement collapsed — measured 24/128
    * agreeing slots on a jaccard-0.97 pair, i.e. the LSH S-curve did not
    * hold at all. With this mixer agreement ≈ jaccard as theory demands.)
    */
  @inline private[graft] def mix64(x0: Long): Long = {
    var z = x0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: per permutation k, min over shingles of
    * mix64(x + salt_k), kept in the non-negative range for stable compares.
    */
  def minhashSig(sh: Array[Int], salts: Array[Long]): Array[Long] = {
    val numPerm = salts.length
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val x = sh(i) & 0xffffffffL
      var k = 0
      while (k < numPerm) {
        val v = mix64(x + salts(k)) >>> 1
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }

  def minhashSig(sh: Array[Int], numPerm: Int, seed: Int): Array[Long] =
    minhashSig(sh, minhashSeeds(numPerm, seed))

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
    val pruned = minhashBandRows(df, p, textCol, idCol)
      .withColumn("bn", count(lit(1)).over(Window.partitionBy($"band", $"band_sig")))
      .where($"bn" <= p.maxBucket)

    val l = pruned.select($"band", $"band_sig", $"id".as("a"))
    val r = pruned.select($"band", $"band_sig", $"id".as("b"))
    val cands = l.join(r, Seq("band", "band_sig"))
      .where($"a" < $"b")
      .select($"a", $"b")
      .dropDuplicates("a", "b")
    verifyJaccard(cands, df, p, textCol, idCol)
  }

  /** The banding half of [[minhashPairs]]: (id, band, band_sig) rows — also
    * the PERSISTABLE blocking index of a standing corpus (an incremental
    * ingest signs only the new batch and joins its band rows against the
    * stored ones, O(batch) work, never re-signing history).
    */
  def minhashBandRows(df: DataFrame, p: MinHashParams = MinHashParams(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = p.shingleW; val bands = p.bands
    val rpb = p.rowsPerBand
    val salts = minhashSeeds(p.numPerm, p.seed) // once, driver-side
    // band rows carry ONLY (id, band, band_sig) — the full shingle arrays
    // never enter the bucket shuffle (they rode through the band join and
    // pair dedup in r1, multiplying shuffle bytes by the document size)
    df.select(col(idCol).cast("string").as("id"), col(textCol).as("t"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val sig = minhashSig(shingles(text, w), salts)
          (0 until bands).iterator.map { b =>
            var h = MurmurHash3.arraySeed
            var j = b * rpb
            val end = j + rpb
            while (j < end) { h = MurmurHash3.mix(h, (sig(j) ^ (sig(j) >>> 32)).toInt); j += 1 }
            (id, b, MurmurHash3.finalizeHash(h, rpb))
          }
        }
      }.toDF("id", "band", "band_sig")
  }

  /** The verify half of [[minhashPairs]]: exact-Jaccard re-check of
    * candidate (a, b) pairs. Re-derives the shingle sets (cheap murmur
    * pass, no minhash) and joins them to the deduped candidates only — AQE
    * broadcasts the candidate side when small, so the shingle arrays never
    * shuffle. `docs` must cover every id appearing in `cands` (for a
    * cross-corpus check pass the union of the batch and the semi-joined
    * history slice — O(candidates), not O(history)).
    */
  def verifyJaccard(cands: DataFrame, docs: DataFrame,
      p: MinHashParams = MinHashParams(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = p.shingleW
    val shingleSets = docs
      .select(col(idCol).cast("string").as("id"), col(textCol).as("t"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.map { case (id, text) => (id, shingles(text, w).distinct) }
      }.toDF("id", "sh")
    cands
      .join(shingleSets.select($"id".as("a"), $"sh".as("sh_a")), "a")
      .join(shingleSets.select($"id".as("b"), $"sh".as("sh_b")), "b")
      .withColumn("jaccard", round(
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")), 6))
      .where($"jaccard" >= p.jaccardThreshold)
      .select($"a", $"b", $"jaccard")
  }

  // ---------------------------------------------------------------- simhash

  /** 60-bit token hash: little-endian long of the first 8 md5 bytes, logical
    * shift right 4 — chosen so DuckDB reproduces it exactly as
    * `md5_number_upper(tok) >> 4` (UBIGINT), making the whole SimHash
    * pipeline oracle-checkable in plain SQL. 60 bits keeps every bit-op in
    * the non-negative signed-64 domain on both engines.
    */
  def tokenHash60(md: java.security.MessageDigest, tok: String): Long = {
    md.reset()
    val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h >>> 4
  }

  /** 60-bit SimHash over token md5 hashes, frequency-weighted (each token
    * occurrence votes ±1 per bit). Returns None for token-less documents —
    * empty docs have no content signature (exact dedup covers them) and
    * keeping them out matches the SQL oracle, where a doc with no tokens
    * produces no signature row.
    */
  def simhash60(md: java.security.MessageDigest, text: String): Option[Long] = {
    val counts = new Array[Int](60)
    val toks = text.toLowerCase.split("\\s+")
    var any = false
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        any = true
        val h = tokenHash60(md, toks(i))
        var b = 0
        while (b < 60) { if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1; b += 1 }
      }
      i += 1
    }
    if (!any) None
    else {
      var sig = 0L
      var b = 0
      while (b < 60) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
      Some(sig)
    }
  }

  /** Near-duplicate pairs with Hamming distance ≤ maxHamming, blocked by the
    * pigeonhole principle: split the 60-bit signature into maxHamming+1
    * chunks — any pair within distance k must agree on ≥1 chunk exactly, so
    * the self-join runs per (chunk index, chunk value) bucket only.
    *
    * The default maxHamming=3 is the web-dedup operating point (Manku,
    * Jain & Sarma, WWW'07 use k=3 over 64-bit simhash for 8B pages): it
    * keeps chunks 15 bits wide, so bucket value-space (32k per chunk index)
    * stays far above any realistic duplicate-cluster size. Wide maxHamming
    * (r1 ran 12 → 4-bit chunks → ~N/16 docs per bucket) degenerates the
    * blocking to near-quadratic — that config cost 59.6s of the r1 bench and
    * is now rejected. `maxBucket` additionally drops boilerplate floods
    * (buckets whose size exceeds it) like the MinHash path does.
    */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3, maxBucket: Int = 2000,
      textCol: String = "text", idCol: String = "doc_id",
      assertLossless: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nChunks = maxHamming + 1
    require(60 / nChunks >= 12,
      s"maxHamming=$maxHamming leaves chunks under 12 bits — the pigeonhole " +
        "blocking degenerates to a near-quadratic candidate join; use MinHash " +
        "LSH for loose similarity thresholds instead")
    val bitsPer = 60 / nChunks

    val sigs = df.select(col(idCol).cast("string").as("id"), col(textCol).as("t"))
      .as[(String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) => simhash60(md, text).map(s => (id, s)) }
      }
      .toDF("id", "sig")

    // the `bn <= maxBucket` prune below makes blocking LOSSY above the cap
    // while the exact O(N²) DuckDB oracle has no cap — on oracle-gated
    // corpora this check turns the "lossless below the cap" assumption into
    // an assertion (small extra agg job; skip it on production-scale runs
    // where the cap is the intended flood guard)
    if (assertLossless) {
      val over = sigs.select(posexplode(expr(
          s"transform(sequence(0, ${nChunks - 1}), c -> (sig >> (c * $bitsPer)) & " +
            s"${(1L << bitsPer) - 1})")).as(Seq("chunk", "chunk_val")))
        .groupBy($"chunk", $"chunk_val").agg(count(lit(1)).as("bn"))
        .where($"bn" > maxBucket).limit(1).count()
      require(over == 0,
        s"simhash bucket exceeds maxBucket=$maxBucket on an oracle-gated corpus — " +
          "the blocked join would silently drop pairs the exact oracle keeps")
    }

    val chunked = sigs.select($"id", $"sig",
      posexplode(expr(
        s"transform(sequence(0, ${nChunks - 1}), c -> (sig >> (c * $bitsPer)) & " +
          s"${(1L << bitsPer) - 1})"))
        .as(Seq("chunk", "chunk_val")))
      .withColumn("bn", count(lit(1)).over(Window.partitionBy($"chunk", $"chunk_val")))
      .where($"bn" <= maxBucket)

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

  /** String shingles mirroring the SQL-oracle form exactly: lowercased
    * whitespace tokens, w-windows joined by \u0001, distinct; short texts
    * collapse to one whole-text shingle. (The Murmur-hashed [[shingles]]
    * are fine for MinHash, but exact-Jaccard operators use the raw strings
    * so a hash collision can never change a similarity.)
    */
  private def stringShingles(text: String, w: Int): Array[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) Array.empty
    else if (toks.length < w) Array(toks.mkString("\u0001"))
    else (0 to toks.length - w).map(i => toks.slice(i, i + w).mkString("\u0001"))
      .distinct.toArray
  }

  /** Prefix-filtered set-similarity self-join — the PPJoin family (Xiao,
    * Wang, Lin, Yu, WWW'08): COMPLETE Jaccard-threshold pair finding whose
    * inverted index holds only each document's PREFIX, not every shingle.
    * Shingles are globally ordered by ascending document frequency (rarest
    * first — the canonical ordering; ties broken by the shingle string so
    * every doc sorts consistently); a pair at jaccard ≥ t MUST share a
    * shingle inside each side's first `sz − ⌈t·sz⌉ + 1` shingles, so
    * indexing only prefixes loses nothing — completeness is a theorem, not
    * a recall knob. At t = 0.8 the index (and the candidate shuffle it
    * feeds) carries ~20% of the rows [[ngramJaccardPairs]]' full inverted
    * index does, and unlike that operator's `maxDocFreq` cap the pruning
    * here is lossless. Candidates are verified with an exact shared-count
    * join. The ⌈t·sz⌉ is computed as ceil(round(t·sz, 9)) — float noise
    * can then only LENGTHEN a prefix, never break completeness.
    *
    * Scale shape: shuffles keyed by shingle carry only prefix rows
    * (≈(1−t)·tokens); the df-rank window and verify joins key on doc id.
    * (Positional/suffix filtering — the "+" of PPJoin+ — prunes further at
    * identical completeness; the prefix filter is the load-bearing part.)
    */
  def ppjoinPairs(df: DataFrame, w: Int = 3, threshold: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(threshold > 0 && threshold <= 1, "ppjoinPairs: threshold in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val shUdf = udf((s: String) => stringShingles(s, w))
    val exploded = df.select(col(idCol).cast("string").as("id"),
      explode(shUdf(col(textCol))).as("sh")).localCheckpoint(true)
    val sizes = exploded.groupBy($"id").agg(count(lit(1)).as("sz"))
    val dfreq = exploded.groupBy($"sh").agg(count(lit(1)).as("gdf"))
    val prefix = exploded.join(dfreq, "sh")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"id").orderBy($"gdf", $"sh")))
      .join(sizes, "id")
      .where($"rk" <= $"sz" - ceil(round(lit(threshold) * $"sz", 9)) + 1)
      .select($"id", $"sh")
    val cands = prefix.as("x").join(prefix.as("y"), "sh")
      .where($"x.id" < $"y.id")
      .select($"x.id".as("a"), $"y.id".as("b")).distinct()
    val shared = cands
      .join(exploded.select($"id".as("a"), $"sh"), "a")
      .join(exploded.select($"id".as("b"), $"sh"), Seq("b", "sh"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select($"id".as("a"), $"sz".as("sz_a")), "a")
      .join(sizes.select($"id".as("b"), $"sz".as("sz_b")), "b")
      .withColumn("jaccard",
        round($"shared".cast("double") / ($"sz_a" + $"sz_b" - $"shared"), 6))
      .where($"jaccard" >= threshold)
      .select($"a", $"b", $"jaccard")
  }

  /** Asymmetric containment join: all ordered pairs with
    * c(src→dst) = |S(src) ∩ S(dst)| / |S(src)| ≥ threshold over the same
    * string shingles as [[ppjoinPairs]]. Containment is what quote/subset
    * detection actually needs — a tweet quoted inside a news article has
    * near-zero Jaccard but containment 1.0, so a symmetric threshold can
    * never find it. Each unordered overlap yields up to two ordered rows
    * (A-in-B and B-in-A are different facts).
    *
    * Scale shape: same inverted-index + exact-verify plan as the Jaccard
    * family; `maxDocFreq` caps boilerplate-flood buckets (a prefix filter
    * does NOT transfer to containment — the contained side's prefix bound
    * degenerates at c=1, so the DF cap is the honest prune here).
    */
  def containmentPairs(df: DataFrame, w: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Int = 1000, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(threshold > 0 && threshold <= 1, "containmentPairs: threshold in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val shUdf = udf((s: String) => stringShingles(s, w))
    val exploded = df.select(col(idCol).cast("string").as("id"),
      explode(shUdf(col(textCol))).as("sh"))
    val sizes = exploded.groupBy($"id").agg(count(lit(1)).as("sz"))
    val capped = exploded
      .withColumn("gdf", count(lit(1)).over(Window.partitionBy($"sh")))
      .where($"gdf" <= maxDocFreq)
    val shared = capped.as("x").join(capped.as("y"), "sh")
      .where($"x.id" =!= $"y.id")
      .groupBy($"x.id".as("src"), $"y.id".as("dst"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select($"id".as("src"), $"sz".as("sz_src")), "src")
      .withColumn("containment",
        round($"shared".cast("double") / $"sz_src", 6))
      .where($"containment" >= threshold)
      .select($"src", $"dst", $"containment")
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
    // one API, two regimes: beyond the exact-scan bound, route to sign-RP
    // LSH blocking + exact verify (bounded recall, O(rows × bands) shuffle)
    // instead of refusing — r1 threw here, turning a scale cliff into a
    // hard failure in a benched query path. The bound is probed with a
    // limit-count (stops scanning at the bound) BEFORE anything is collected.
    val overBound =
      embeddings.select(col(idCol)).limit(maxBroadcastRows + 1).count() > maxBroadcastRows
    if (overBound)
      return embeddingPairsLsh(embeddings, threshold, idCol, embCol)
    val rows = embeddings.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
    val all = rows.collect().sortBy(_._1)
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

  /** Scale path for [[embeddingPairs]]: sign-random-projection LSH blocking
    * (graft.resolve.Resolution.candidatePairs) + exact cosine verify on
    * candidates only. Recall is bounded by the band S-curve instead of exact,
    * which is the correct trade beyond the broadcast bound — O(rows × bands)
    * shuffle instead of an N² scan.
    */
  def embeddingPairsLsh(embeddings: DataFrame, threshold: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = embeddings.select(col(embCol)).head.getSeq[Float](0).length
    val p = graft.resolve.Resolution.Params(
      dim = dim, cosineThreshold = threshold, topK = Int.MaxValue)
    val named = embeddings.select(col(idCol).cast("string").as("entity_id"), col(embCol).as("embedding"))
    graft.resolve.Resolution.candidatePairs(named, p)
      .where($"src" < $"dst" && $"cos" >= threshold) // one direction of the sym pairs
      .select(least($"src".cast("long"), $"dst".cast("long")).as("a"),
        greatest($"src".cast("long"), $"dst".cast("long")).as("b"),
        round($"cos", 6).as("cos"))
  }

  // -------------------------------------------- repeated-substring coverage

  /** Cross-document repeated-substring statistics — the windowed-hash
    * approximation of Lee et al. 2021 ("Deduplicating Training Data Makes
    * Language Models Better", ExactSubstr): every `windowTokens`-token
    * window shared by ≥ `minDocs` distinct documents is a duplicated span;
    * per document we report the window count and the number of token
    * positions covered by the union of those spans (gaps-and-islands over
    * the sorted window starts — no position explode). Windowed detection
    * catches every duplicated substring of length ≥ windowTokens, the same
    * guarantee band the suffix-array method provides at its cut-off, and
    * unlike a suffix array it is a pure groupBy/join plan.
    *
    * Output per input row: (id, n_tokens, n_dup_windows, covered_tokens,
    * dup_frac) — docs with no duplicated spans carry zeros.
    *
    * Scale: the window table is O(total tokens) rows, shuffled once keyed
    * by the window text. At 100 TB key by xxhash64(gram) instead (8-byte
    * shuffle key; collisions only over-count, which a dup FRACTION
    * tolerates) and cap per-gram doc frequency like [[ngramJaccardPairs]];
    * the raw-string key here keeps the semantics exactly DuckDB-checkable.
    */
  def substringDupStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", windowTokens: Int = 8, minDocs: Int = 2): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    val w = windowTokens
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), x => x =!= lit(""))
    val base = df.select(col(idCol), toks.as("tk"))
    val wins = base.select(col(idCol),
        explode(when(size(col("tk")) >= w,
          transform(sequence(lit(1), greatest(size(col("tk")) - (w - 1), lit(1))),
            i => struct(i.as("pos"), concat_ws(" ", slice(col("tk"), i, lit(w))).as("gram"))))
          .otherwise(array().cast("array<struct<pos:int,gram:string>>"))).as("win"))
      .select(col(idCol), col("win.pos").as("pos"), col("win.gram").as("gram"))
    val dupGrams = wins.groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") >= minDocs).select(col("gram"))
    val dupWins = wins.join(dupGrams, Seq("gram"), "left_semi")
    val ord = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perDoc = dupWins
      .withColumn("prev_end", max(col("pos") + w).over(ord))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_dup_windows"),
        sum(greatest(lit(0),
          (col("pos") + w) - greatest(coalesce(col("prev_end"), col("pos")), col("pos"))))
          .cast("long").as("covered_tokens"))
    base.select(col(idCol), size(col("tk")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("covered_tokens"), lit(0L)) / col("n_tokens"))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  // ------------------------------------------------- history (Bloom) dedup

  /** Incremental exact dedup of a new crawl batch against an UNBOUNDED
    * history — the operation a standing 100 TB corpus runs on every ingest,
    * where joining the batch against the full history table would rescan
    * the warehouse. Instead the history's content digests are folded ONCE
    * into a Bloom filter (Spark's `stat.bloomFilter`: one aggregation with
    * map-side partial filters, merged on the driver — ~1.2 GB of bits for
    * 10^9 docs at 1% fpp, broadcastable) and the batch is a pure map-side
    * probe: O(batch) work, zero shuffles, no rescan of history.
    *
    * One-sided error, in the SAFE direction for dedup: `mightContain` has
    * NO false negatives, so a true duplicate is never re-admitted; a false
    * positive drops a genuinely-new doc with probability ≈ fpp (the
    * standard recall/storage trade — q_bloom_dedup gates both directions).
    * At warehouse scale the filter is built incrementally too: `putString`
    * per ingest batch and persist the filter's bitset alongside the table
    * (`BloomFilter.writeTo/readFrom`), so no full-history fold ever recurs.
    */
  def bloomNewDocs(history: DataFrame, batch: DataFrame,
      textCol: String = "text", fpp: Double = 0.01,
      expectedItems: Option[Long] = None): DataFrame = {
    val digests = history.select(md5(col(textCol).cast("binary")).as("digest"))
    val n = expectedItems.getOrElse(digests.count())
    val bf = digests.stat.bloomFilter("digest", math.max(n, 1L), fpp)
    val bc = history.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((d: String) => bc.value.mightContainString(d))
    batch.withColumn("digest", md5(col(textCol).cast("binary")))
      .where(!mightContain(col("digest")))
  }

  // ---------------------------------------------- survivor (canonical) pick

  /** Survivor selection over duplicate clusters — the step that turns a
    * dedup DETECTION into a dedup DECISION (the CCNet/RefinedWeb "keep the
    * best copy" pass): within each cluster exactly one document survives,
    * the argmax of `quality` with ties broken by the lexicographically
    * smallest id; documents in no cluster survive untouched.
    *
    * `clusters`: (idCol, cluster_id) as produced by the connected-components
    * assignment (q_dedup_clusters). Returns the full decision table
    * (idCol, cluster_id — null for unclustered docs, kept) so the drop set,
    * keep set, and attribution are all one filter away.
    *
    * Scale: one shuffle on cluster_id for the per-cluster window (cluster
    * sizes are bounded by the upstream pair guards — maxBucket/maxDocFreq —
    * so no window partition is hot), one left-anti join for the loners
    * (broadcastable: the cluster table is the small side, duplicates are a
    * few percent of a web corpus).
    */
  def canonicalDocs(docs: DataFrame, clusters: DataFrame, quality: Column,
      idCol: String = "doc_id"): DataFrame = {
    val q = docs.select(col(idCol).cast("string").as(idCol), quality.as("_q"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("_q").desc, col(idCol).asc)
    val decided = clusters.join(q, idCol)
      .withColumn("kept", row_number().over(w) === 1)
      .select(col(idCol), col("cluster_id"), col("kept"))
    val loners = q.join(clusters, Seq(idCol), "left_anti")
      .select(col(idCol), lit(null).cast("string").as("cluster_id"),
        lit(true).as("kept"))
    decided.unionByName(loners)
  }

  // ------------------------------------------------------------- SemDeDup

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC deduplication
    * within precomputed embedding clusters — the pass that removes "same
    * content, different words" documents MinHash can't see. Within each
    * cluster, any two items with cosine ≥ `threshold` are semantic
    * duplicates; from every such pair the member with the HIGHER
    * cosine-to-centroid is dropped (the paper's keep-the-outlier rule —
    * prototypical restatements go, the most distinctive phrasing stays),
    * ties by keeping the lower id. Returns the full decision table
    * (vec_id, cluster, centroid_cos, is_kept) — drop set and keep set are
    * one filter away.
    *
    * Clusters are an INPUT (a label column), not computed here: at scale
    * they come from the materialized IVF index ([[graft.operators.IvfIndex]]
    * assignments), which is exactly how the paper runs (k-means preceding
    * the dedup). That also keeps this fully oracle-able — no data-dependent
    * pivots in the operator itself.
    *
    * Numerics: pair cosine is the codegen'd native expression; centroid
    * cosine is the same index-order double fold over the sorted-id-fold
    * centroid ([[graft.extract.Embeddings.centroids]]) — both are
    * bit-reproducible cross-engine (+,*,/,sqrt are IEEE-exact), so the
    * keep/drop comparisons need no rounding and the DuckDB oracle replays
    * them exactly.
    *
    * Scale: the whole point of clustering first is that pair verification
    * is O(Σ cᵢ²) instead of O(N²) — one shuffle keyed by cluster, cluster
    * sizes bounded (√N-ish under IVF's auto-k). `maxClusterSize` makes the
    * bound explicit: a cluster above it (degenerate clustering) fails fast
    * instead of silently quadratic. Centroids are k rows — broadcast.
    */
  def semDedup(embeddings: DataFrame, threshold: Double,
      clusterCol: String = "label", idCol: String = "vec_id",
      embCol: String = "embedding", maxClusterSize: Long = 100000): DataFrame = {
    val e = embeddings.select(
      col(idCol).cast("long").as("vec_id"),
      col(clusterCol).cast("long").as("cluster"),
      col(embCol).as("emb"))
    val over = e.groupBy(col("cluster")).count()
      .where(col("count") > maxClusterSize).limit(1).count()
    require(over == 0,
      s"semDedup cluster exceeds maxClusterSize=$maxClusterSize — pairwise verify " +
        "would go quadratic; re-cluster with more centroids or raise the bound knowingly")
    val cents = graft.extract.Embeddings.centroids(e, "cluster", "vec_id", "emb")
      .select(col("cluster"), col("centroid"))
    val scored = e.join(broadcast(cents), Seq("cluster"))
      .withColumn("centroid_cos", Similarity.cosineCol(col("emb"), col("centroid")))
      .select(col("vec_id"), col("cluster"), col("emb"), col("centroid_cos"))
    val lhs = scored.select(col("cluster"), col("vec_id").as("a"),
      col("emb").as("ea"), col("centroid_cos").as("ca"))
    val rhs = scored.select(col("cluster"), col("vec_id").as("b"),
      col("emb").as("eb"), col("centroid_cos").as("cb"))
    val pairs = lhs.join(rhs, Seq("cluster"))
      .where(col("a") < col("b"))
      .where(Similarity.cosineFast(col("ea"), col("eb")) >= threshold)
    // from each dup pair the higher-centroid-cos member loses; on an exact
    // tie the higher id loses (b — a < b always holds here)
    val losers = pairs
      .select(when(col("ca") <= col("cb"), col("b")).otherwise(col("a")).as("vec_id"))
      .distinct()
    scored
      .join(losers.withColumn("_dropped", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        round(col("centroid_cos"), 6).as("centroid_cos"),
        coalesce(!col("_dropped"), lit(true)).as("is_kept"))
  }
}
