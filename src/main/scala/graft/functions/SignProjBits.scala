package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native sign-random-projection LSH bits: bit j (0-based, little-endian)
  * is set iff Σ_i s(i,j)·x_i > 0 with deterministic Rademacher-style signs
  *
  *   s(i,j) = +1 if ((i·37 + j·101 + i·j·13) mod 97) < 48 else −1
  *
  * (i = 0-based element index). One pass over the array computes all
  * `nBits` projections; accumulation is double, strictly left-to-right per
  * projection, so the DuckDB `list_reduce` mirror is bit-identical (only
  * accumulation *order* matters for IEEE-754 cross-engine equality).
  *
  * This is the wide-key SRP family (Charikar's sign hashes): `nBits` of
  * 16–32 gives a 2^16+ key space; band-slicing the result (e.g. 4 bands
  * of 8 bits) OR-amplifies recall while each band key stays selective
  * enough that within-band bucket sizes — and hence candidate pair
  * counts — stay bounded at scale.
  */
case class SignProjBits(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits > 0 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_proj_bits requires array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_proj_bits"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = isFloat
    var bits = 0L
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        acc += (if ((i * 37 + j * 101 + i * j * 13) % 97 < 48) v else -v)
        i += 1
      }
      if (acc > 0.0) bits |= 1L << j
      j += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bits = ctx.freshName("bits")
      val v = ctx.freshName("v")
      val get = if (isFloat) s"(double) $c.getFloat($i)" else s"$c.getDouble($i)"
      s"""
         |int $n = $c.numElements();
         |long $bits = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = $get;
         |    $acc += ((($i * 37 + $j * 101 + $i * $j * 13) % 97) < 48) ? $v : -$v;
         |  }
         |  if ($acc > 0.0) $bits |= 1L << $j;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignProjBits =
    copy(child = newChild)
}

object SignProjBits {
  def apply(c: Column, nBits: Int): Column =
    ColumnBridge.column(SignProjBits(ColumnBridge.expression(c), nBits))
}
