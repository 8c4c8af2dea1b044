package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst promotion of `TextStats.fingerprintUdf` — the 64-bit
  * FNV-1a token-stream fingerprint that keys exact dedup digests, stratified
  * /temperature sampling and loader-shard assignment. Those are narrow
  * whole-corpus scans: as a Scala UDF the call sits behind a codegen fence
  * (per-row String boxing through the lambda + null-check wrapper); as an
  * Expression it inlines into the surrounding WholeStageCodegen span and the
  * scan stays one generated loop.
  *
  * Both eval paths call the SAME [[graft.operators.TextStats.fingerprint64]]
  * body, so swapping UDF ↔ expression can never change a result bit
  * (asserted by spec — the q_fingerprint / q_sample_* / q_shard_* oracles
  * depend on these exact values).
  */
case class Fingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    graft.operators.TextStats.fingerprint64(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.TextStats$$.MODULE$$.fingerprint64($c.toString())")
}
