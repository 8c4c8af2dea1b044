package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) as a mergeable Spark
  * `Aggregator` — the bounded-memory point-frequency estimator that
  * complements [[FreqSketch.MisraGries]] (which keeps the top-k SET, not
  * arbitrary-token estimates). depth×width cells, est(x) = min over rows r of
  * cell(r, h_r(x)); est is NEVER below the true count, and exceeds it by more
  * than 2N/width on any fixed x with probability ≤ 2^-depth.
  *
  * Unlike Misra–Gries, the sketch is LINEAR: every cell is a plain sum over
  * the input, so the merged sketch is bit-identical under ANY partitioning /
  * reduce / merge order — and an external engine can recompute every cell
  * exactly. The q_cm_cells oracle does exactly that: DuckDB re-derives the
  * full depth×width grid from exact token counts and the same FNV-1a row
  * hashes, and the driver hash-compares all cells.
  *
  * Row hash: h_r(x) = fnv1a("r:" ++ x) mod width (unsigned) — riding
  * [[graft.operators.TextStats.fingerprint64]] so the oracle reuses the
  * established HUGEINT FNV fold. At 100 TB this is one partial-agg pass with
  * O(depth·width) state per task, the same shape as the built-in HLL/GK
  * sketches for the point-frequency query they don't answer.
  */
object CmSketch {

  /** cells are row-major: cell(r, c) = cells(r * width + c). */
  case class CmResult(depth: Int, width: Int, cells: Seq[Long]) {
    def estimate(token: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val v = cells(r * width + bucket(r, width, token))
        if (v < best) best = v
        r += 1
      }
      if (best == Long.MaxValue) 0L else best
    }
  }

  /** Column index of token x in row r: unsigned FNV-1a of "r:x" mod width. */
  def bucket(r: Int, width: Int, token: String): Int =
    java.lang.Long.remainderUnsigned(
      graft.operators.TextStats.fingerprint64(s"$r:$token"), width.toLong).toInt

  class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], CmResult] {
    require(depth >= 1 && width >= 2, "CountMin: depth >= 1, width >= 2")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(b: Array[Long], x: String): Array[Long] = {
      if (x != null) {
        var r = 0
        while (r < depth) { b(r * width + bucket(r, width, x)) += 1L; r += 1 }
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): CmResult =
      CmResult(depth, width, b.toSeq)

    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[CmResult] = Encoders.product[CmResult]
  }

  /** Column aggregate: `df.agg(CmSketch.countMin(4, 256)(col("token")))`. */
  def countMin(depth: Int, width: Int): Column => Column = {
    val fn = udaf(new CountMin(depth, width), Encoders.STRING)
    (c: Column) => fn(c)
  }
}
