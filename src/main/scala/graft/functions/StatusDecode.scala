package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native STATUS-frame decoder (OP-7, etl_controller.py:615-623):
  * `{BASTATUS,a,b,…}` → array<struct<output int, input int>>, 1-based
  * positional outputs, non-digit parts skipped. Digit parts longer than
  * 18 digits or exceeding Int.MaxValue are dropped like non-digit parts
  * (outputs stay positional). Same semantics as
  * [[graft.ops.Protocol.statusRoutes]] (regexp + split + HOF filter),
  * evaluated as one pass over the frame bytes.
  */
case class StatusDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_status_decode requires a string child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("output", IntegerType, nullable = false),
      StructField("input", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_status_decode"

  override def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[UTF8String])

  private val marker = "{BASTATUS,".getBytes("US-ASCII")

  /** Public for generated code. */
  def decode(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = input.getBytes
    // find "{BASTATUS," like the re.search the reference uses
    var start = -1
    var i = 0
    while (start < 0 && i + marker.length <= bytes.length) {
      var j = 0
      while (j < marker.length && bytes(i + j) == marker(j)) j += 1
      if (j == marker.length) start = i + marker.length else i += 1
    }
    if (start < 0) return new GenericArrayData(Array.empty[Any])
    var end = start
    while (end < bytes.length && bytes(end) != '}') end += 1
    if (end >= bytes.length) return new GenericArrayData(Array.empty[Any]) // no closing brace
    // split payload [start, end) on ',', keep digit-only parts
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 1
    var p = start
    var value = 0L
    var nDigits = 0
    var allDigits = true
    i = start
    while (i <= end) {
      if (i == end || bytes(i) == ',') {
        val len = i - p
        // ≤18-digit bound + value check mirrors Protocol.statusRoutes
        // exactly (a 19-digit part is dropped even if its numeric value
        // is small, e.g. leading zeros)
        if (len > 0 && allDigits && nDigits == len && nDigits <= 18 &&
            value <= Int.MaxValue) {
          out += new GenericInternalRow(Array[Any](pos, value.toInt))
        }
        pos += 1; p = i + 1; value = 0L; nDigits = 0; allDigits = true
      } else {
        val b = bytes(i)
        if (b >= '0' && b <= '9') {
          if (value <= Int.MaxValue) value = value * 10 + (b - '0')
          nDigits += 1
        } else allDigits = false
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("statusDecode", this, classOf[StatusDecode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.decode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StatusDecode =
    copy(child = newChild)
}

object StatusDecode {
  def apply(c: Column): Column =
    ColumnBridge.column(StatusDecode(ColumnBridge.expression(c)))
}
