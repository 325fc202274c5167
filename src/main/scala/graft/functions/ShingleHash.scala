package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingle-hash array (arity 2 = bigrams, 3 =
  * trigrams, …): splits on single spaces (trailing empties kept, matching
  * `split(s, " ")`), polynomial-hashes each token (h ← h·31 + byte mod P),
  * and composes each gram's hash algebraically by extending the running
  * residue — appending a space is h ← h·31 + 32, appending a token t is
  * h ← h·31^|t| + hash(t) — exactly the char-fold hash of the
  * space-joined gram string ("w1 w2 … wk"), in one pass over the text
  * (ASCII input: byte == char). Fewer than `arity` tokens ⇒ empty array.
  * Not deduplicated (downstream min/distinct aggregation is
  * dedup-insensitive).
  *
  * Dual-residue mode (`mod2 > 0`): each gram carries TWO independent
  * residues from the same pass, laid into one long as
  * `h1 · 2³¹ + h2` (h2 < mod2 < 2³¹, h1 < mod ≤ 3037000499 keeps the
  * sum under 2⁶³). A single ~30-bit residue collides at birthday rate
  * n²/2P — ~0.2 expected FALSE gram matches at a mere 24k distinct
  * grams (measured: one real collision at sf0.001), hopeless at corpus
  * scale — while the pair collides at n²/2(mod·mod2) ≈ n²/2⁶². Use it
  * wherever a gram equality IS the verdict (q80's decontamination flag,
  * q81's span coverage); the single-residue form stays for
  * recall-oriented signals that verify candidates afterwards (q31) or
  * aggregate over many grams (q53/q66 fractions).
  */
case class ShingleHash(child: Expression, mod: Long, arity: Int,
    mod2: Long = 0L)
    extends UnaryExpression {
  // per-gram terms multiply two residues: mod² must stay within Long
  require(mod > 1 && mod <= 3037000499L,
    s"mod must be in (1, 3037000499], got $mod")
  // the packed form h1·2³¹ + h2 must stay within Long: mod2 < 2³¹
  require(mod2 == 0L || (mod2 > 1 && mod2 < 2147483648L),
    s"mod2 must be 0 (off) or in (1, 2^31), got $mod2")
  require(arity >= 1, s"arity must be >= 1, got $arity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash requires a string child, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash"

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
    if (nTok < arity) return new GenericArrayData(Array.empty[Long])
    val dual = mod2 > 0L
    // one pass over the bytes folds BOTH residue streams (dual mode
    // costs two modmuls per byte, not a second scan)
    val th = new Array[Long](nTok)
    val th2 = if (dual) new Array[Long](nTok) else null
    t = 0
    while (t < nTok) {
      var h = 0L
      var h2 = 0L
      var j = starts(t)
      val end = starts(t) + lens(t)
      while (j < end) {
        val b0 = bytes(j) & 0xff
        h = (h * 31 + b0) % mod
        if (dual) h2 = (h2 * 31 + b0) % mod2
        j += 1
      }
      th(t) = h
      if (dual) th2(t) = h2
      t += 1
    }
    def pow31(k: Int, m0: Long): Long = {
      var p = 1L
      var n = k
      while (n > 0) { p = p * 31 % m0; n -= 1 }
      p
    }
    val out = new Array[Long](nTok - arity + 1)
    var g = 0
    while (g < out.length) {
      var acc = th(g)
      var acc2 = if (dual) th2(g) else 0L
      var m = 1
      while (m < arity) {
        acc = (acc * 31 + 32) % mod // ' '
        acc = (acc * pow31(lens(g + m), mod) + th(g + m)) % mod
        if (dual) {
          acc2 = (acc2 * 31 + 32) % mod2
          acc2 = (acc2 * pow31(lens(g + m), mod2) + th2(g + m)) % mod2
        }
        m += 1
      }
      out(g) = if (dual) acc * 2147483648L + acc2 else acc
      g += 1
    }
    new GenericArrayData(out)
  }

  // interpreted eval is already a single tight loop; fall back to it from
  // generated code rather than inlining ~80 lines of Java
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHash", this, classOf[ShingleHash].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = $ref.hashShingles($c);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  def apply(c: Column, mod: Long, arity: Int): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(c), mod, arity))
  def apply(c: Column, mod: Long, arity: Int, mod2: Long): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(c), mod, arity, mod2))
}

/** Trigram convenience alias (the q31 MinHash signature path). */
object ShingleHash3 {
  def apply(c: Column, mod: Long): Column = ShingleHash(c, mod, 3)
}
