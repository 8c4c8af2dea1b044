package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Session extensions registering the engine's native expressions. Install
  * with either:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   --conf spark.sql.extensions=graft.GraftExtensions    (spark-submit)
  *
  * After installation `graft_cosine(a, b)` is available in SQL and via
  * `expr("graft_cosine(a, b)")` — a whole-stage-codegen expression over
  * float arrays, bit-identical to Similarity.cosineUdf but with no
  * per-row Seq materialization.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
    ext.injectFunction(GraftExtensions.fingerprintDescriptor)
  }
}

object GraftExtensions {
  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    { children: Seq[Expression] =>
      require(children.size == 2, "graft_cosine takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  val fingerprintDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fingerprint64"),
    new ExpressionInfo(classOf[graft.functions.Fingerprint64].getName, "graft_fingerprint64"),
    { children: Seq[Expression] =>
      require(children.size == 1, "graft_fingerprint64 takes exactly 1 argument")
      graft.functions.Fingerprint64(children.head)
    })

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(cosineDescriptor, fingerprintDescriptor).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
