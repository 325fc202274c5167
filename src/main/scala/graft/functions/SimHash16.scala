package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-bit SimHash over single-space tokens: each token's 16-bit
  * polynomial hash (h ← h·mult + byte mod 65536) votes ±1 per bit; the
  * sign of each bit-sum forms the fingerprint. Bit-identical to
  * [[graft.ops.TextOps.simhash16]]'s built-in fold (ASCII input, mult =
  * 31, mod = 65536) — one JVM pass instead of a 16-wide zip_with per
  * token. For INDEPENDENT hash families use distinct prime `mod` values
  * (< 65536 so results stay 16-bit): each family is the same polynomial
  * value reduced mod a different prime — CRT-independent residues —
  * whereas families differing only in an odd `mult` under a power-of-2
  * modulus share bit 0 exactly (h·mult+byte ≡ h+byte mod 2) and pair up
  * on bit 1. Four prime-modulus families side by side form the 64-bit
  * banded SimHash (q51).
  */
case class SimHash16(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {
  require(mod > 1 && mod <= 65536, s"mod must be in (1, 65536], got $mod")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash16 requires a string child, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash16"

  override def nullSafeEval(input: Any): Any =
    hash(input.asInstanceOf[UTF8String])

  /** Public for generated code. */
  def hash(input: UTF8String): Long = {
    val bytes = input.getBytes
    val votes = new Array[Long](16)
    var h = 0L
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        // token boundary: h is the token hash (empty token hashes to 0)
        var b = 0
        while (b < 16) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
        h = 0L
      } else {
        h = (h * mult + (bytes(i) & 0xff)) % mod
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash16].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.hash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  def apply(c: Column): Column = apply(c, 31L, 65536L)
  def apply(c: Column, mult: Long, mod: Long): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(c), mult, mod))
}
