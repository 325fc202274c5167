package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 3-gram shingle-hash array: splits on single spaces (trailing
  * empties kept, matching `split(s, " ")`), polynomial-hashes each token
  * (h ← h·31 + byte mod P), and composes per-gram hashes algebraically —
  *
  *   H(t1·' '·t2·' '·t3) = t1h·31^(2+|t2|+|t3|) + 32·31^(1+|t2|+|t3|)
  *                       + t2h·31^(1+|t3|) + 32·31^(|t3|) + t3h   (mod P)
  *
  * exactly [[graft.ops.TextOps.shingleHashes3]] ∘ per-token
  * [[PolyHash]], in one pass (ASCII input: byte == char). Shorter than 3
  * tokens ⇒ empty array. Not deduplicated (downstream min-aggregation is
  * dedup-insensitive).
  */
case class ShingleHash3(child: Expression, mod: Long) extends UnaryExpression {
  // per-gram terms multiply two residues: mod² must stay within Long
  require(mod > 1 && mod <= 3037000499L,
    s"mod must be in (1, 3037000499], got $mod")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash3 requires a string child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash3"

  override def nullSafeEval(input: Any): Any =
    hashShingles(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it (protected members are not
    * reachable from the codegen'd class).
    */
  def hashShingles(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = input.getBytes
    // split on single spaces, trailing empties kept
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val lens = new Array[Int](nTok)
    var t = 0
    var s = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        starts(t) = s; lens(t) = i - s; t += 1; s = i + 1
      }
      i += 1
    }
    if (nTok < 3) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](nTok)
    t = 0
    while (t < nTok) {
      var h = 0L
      var j = starts(t)
      val end = starts(t) + lens(t)
      while (j < end) { h = (h * 31 + (bytes(j) & 0xff)) % mod; j += 1 }
      th(t) = h
      t += 1
    }
    def pow31(k: Int): Long = {
      var p = 1L
      var n = k
      while (n > 0) { p = p * 31 % mod; n -= 1 }
      p
    }
    val out = new Array[Long](nTok - 2)
    var g = 0
    while (g < nTok - 2) {
      val l2 = lens(g + 1)
      val l3 = lens(g + 2)
      out(g) = (th(g) * pow31(l2 + l3 + 2) % mod
        + 32L * pow31(l2 + l3 + 1) % mod
        + th(g + 1) * pow31(l3 + 1) % mod
        + 32L * pow31(l3) % mod
        + th(g + 2)) % mod
      g += 1
    }
    new GenericArrayData(out)
  }

  // interpreted eval is already a single tight loop; fall back to it from
  // generated code rather than inlining ~80 lines of Java
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHash", this, classOf[ShingleHash3].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = $ref.hashShingles($c);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash3 =
    copy(child = newChild)
}

object ShingleHash3 {
  def apply(c: Column, mod: Long): Column =
    ColumnBridge.column(ShingleHash3(ColumnBridge.expression(c), mod))
}
