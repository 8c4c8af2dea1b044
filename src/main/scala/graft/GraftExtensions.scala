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

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = cosineDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
