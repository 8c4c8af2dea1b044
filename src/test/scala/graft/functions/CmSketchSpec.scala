package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Count-Min sketch: linearity (cells bit-identical under any partitioning),
  * the one-sided estimate guarantee, and unit reduce/merge rules.
  */
class CmSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus: Seq[String] =
    Seq.fill(50)("hot") ++ Seq.fill(17)("warm") ++
      (0 until 200).map(i => s"tail$i") ++ Seq.fill(3)("cool")

  private def cells(parts: Int): Seq[Long] = {
    val df = corpus.toDF("tok").repartition(parts)
    df.agg(CmSketch.countMin(4, 32)($"tok").as("cm"))
      .select($"cm.cells").as[Seq[Long]].head()
  }

  test("linearity: cells identical at 1, 3, and 8 partitions") {
    val c1 = cells(1)
    assert(cells(3) == c1)
    assert(cells(8) == c1)
  }

  test("cells sum to depth * N and estimates never undercount") {
    val c = cells(5)
    val res = CmSketch.CmResult(4, 32, c)
    assert(c.sum == 4L * corpus.length)
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (tok, n) =>
      assert(res.estimate(tok) >= n, s"undercount for $tok")
    }
    // absent token: estimate may collide upward but never below 0
    assert(res.estimate("never-seen") >= 0L)
    // the heavy hitter dominates its own collisions' bound: est <= N
    assert(res.estimate("hot") <= corpus.length)
  }

  test("reduce/merge unit rules") {
    val agg = new CmSketch.CountMin(2, 8)
    val b = agg.reduce(agg.reduce(agg.zero, "x"), "x")
    assert(b.sum == 4L) // 2 rows x 2 increments
    val m = agg.merge(b, agg.reduce(agg.zero, "y"))
    assert(m.sum == 6L)
    assert(agg.reduce(agg.zero, null).sum == 0L)
    val r = agg.finish(m)
    assert(r.estimate("x") >= 2L && r.estimate("y") >= 1L)
  }

  test("bucket is the row-salted unsigned FNV mod width") {
    val h = graft.operators.TextStats.fingerprint64("3:tok")
    assert(CmSketch.bucket(3, 32, "tok") ==
      java.lang.Long.remainderUnsigned(h, 32L).toInt)
  }
}
