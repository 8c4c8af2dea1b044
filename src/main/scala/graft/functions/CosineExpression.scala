package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity of two float arrays —
  * the codegen'd promotion of `Similarity.cosineUdf` (SURVEY.md §7.3: "if
  * profile shows UDF overhead on cosine, promote it to a codegen'd
  * Expression"). Value over the UDF: operates directly on the unsafe
  * `ArrayData` (no Seq[Float] materialization per row) and inlines into the
  * surrounding whole-stage-codegen span (no serialization fence, no lambda
  * dispatch).
  *
  * Numerics are IDENTICAL to cosineUdf/cosineCol: three index-order double
  * accumulators, `dot / (sqrt(na) * sqrt(nb))`, 0.0 on zero-norm — swapping
  * implementations never changes a result bit (asserted by spec).
  *
  * Registered as SQL function `graft_cosine` by [[graft.GraftExtensions]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val p = x.getFloat(i).toDouble
      val q = y.getFloat(i).toDouble
      d += p * q; na += p * p; nb += q * q
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $d = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $p = (double) $a.getFloat($i);
          double $q = (double) $b.getFloat($i);
          $d += $p * $q; $na += $p * $p; $nb += $q * $q;
        }
        ${ev.value} = ($na == 0.0 || $nb == 0.0)
          ? 0.0 : $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })
}
