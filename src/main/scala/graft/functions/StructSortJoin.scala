package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sort-by-key + join for frame assembly: takes
  * `array<struct<key: long, part: string>>`, sorts by `key` ascending
  * (stable), and joins the `part` strings with `sep` — one pass and one
  * sort over primitive keys, replacing the interpreted
  * `array_join(transform(array_sort(collect_list(struct(...)))))` chain
  * that re-materializes the struct array three times per group.
  */
case class StructSortJoin(child: Expression, sep: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(kf, vf)), _)
        if kf.dataType == LongType && vf.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_struct_sort_join requires array<struct<long, string>>, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_struct_sort_join"

  override def nullSafeEval(input: Any): Any =
    sortJoin(input.asInstanceOf[ArrayData])

  /** Public so generated code can call it. Null entries (possible via SQL
    * `graft_struct_sort_join(array(null, ...))`, never via collect_list)
    * and null keys are skipped rather than NPE-ing the task.
    */
  def sortJoin(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val keys = new Array[Long](n)
    val parts = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0)) {
          keys(m) = row.getLong(0)
          parts(m) = row.getUTF8String(1)
          m += 1
        }
      }
      i += 1
    }
    // index sort on primitive keys; stable for equal keys
    val idx = Array.range(0, m).sortBy(keys)
    val ordered = new Array[UTF8String](m)
    i = 0
    while (i < m) { ordered(i) = parts(idx(i)); i += 1 }
    UTF8String.concatWs(UTF8String.fromString(sep), ordered: _*)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("structSortJoin", this, classOf[StructSortJoin].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sortJoin($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StructSortJoin =
    copy(child = newChild)
}

object StructSortJoin {
  def apply(c: Column, sep: String): Column =
    ColumnBridge.column(StructSortJoin(ColumnBridge.expression(c), sep))
}
