package graft.extract

import scala.util.hashing.MurmurHash3

/** Deterministic text embedder — the offline stand-in for the reference's
  * provider-backed embedding service (`common/embeddings/embedding_services.py:69-137`),
  * behind the same "embed one string → unit vector" interface so a real model
  * can be swapped in via the same mapPartitions pooling. Dimension defaults to
  * the reference's 1536 (`SupportAI_Schema_Native_Vector.gsql:18`,
  * `common/config.py:91`).
  *
  * Signed feature hashing of whitespace tokens → L2-normalized vector. Texts
  * sharing most tokens land at high cosine (same-cluster alias descriptions in
  * the synthesized corpus sit at ≈ 12/13 ≈ 0.92 > the reference's 0.90 ER
  * threshold); disjoint-token texts land near 0.
  */
final class HashEmbedder(val dim: Int = 1536, seed: Int = 42) extends Serializable {

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val tokens = text.toLowerCase.split("\\s+")
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (tok.nonEmpty) {
        val h = MurmurHash3.stringHash(tok, seed)
        val idx = math.floorMod(h, dim)
        val sign = if (((h >>> 31) & 1) == 0) 1f else -1f
        v(idx) += sign
      }
      t += 1
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }
}

object VectorOps extends Serializable {
  /** Exact cosine similarity (inputs need not be normalized). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Dot product (sufficient for cosine on pre-normalized vectors). */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i); i += 1 }
    s
  }
}
