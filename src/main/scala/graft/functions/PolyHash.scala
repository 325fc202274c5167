package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the left-fold polynomial string hash
  * h ← (h·31 + byte) mod `mod` (SURVEY.md §2.10 preference order: custom
  * `Expression` before UDF).
  *
  * Semantically identical to the built-in-HOF fold
  * `aggregate(transform(sequence(1,len), i -> ascii(substr(s,i,1))), …)`
  * for ASCII input (byte == code point), but evaluated as one tight JVM
  * loop — with `doGenCode` when it appears in a codegen'd projection, and
  * a single `nullSafeEval` call (instead of ~20 interpreted expression
  * nodes per character) when it appears inside a higher-order-function
  * lambda, which Spark always evaluates interpreted.
  */
case class PolyHash(child: Expression, mod: Long) extends UnaryExpression {
  // h ≤ mod−1 must survive h*31 + 255 without Long overflow
  require(mod > 1 && mod <= (Long.MaxValue - 255) / 31,
    s"mod must be in (1, ${(Long.MaxValue - 255) / 31}], got $mod")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_poly_hash requires a string child, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xFF)) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Column-level entry point. */
  def apply(c: Column, mod: Long): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), mod))
}
