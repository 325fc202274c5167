package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotFold, PolyHash, ShingleHash, SignProjBits, SimHash16, StatusDecode, StructSortJoin}

/** SparkSessionExtensions entry point: registers ALL of graft's native
  * expressions for SQL use, so
  * `spark.sql("SELECT graft_poly_hash(s, 65536) FROM t")` works — either
  * via `spark.sql.extensions=graft.GraftExtensions` or
  * [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.functions.PolyHashFusion)
    e.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
    e.injectPlannerStrategy(_ => graft.ops.AsOf.AsOfStrategy)
  }
}

object GraftExtensions {

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def descriptor(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  private[graft] val descriptors = Seq(
    descriptor("graft_poly_hash", classOf[PolyHash]) {
      case Seq(s, m) => PolyHash(s, longLit(m, "graft_poly_hash modulus"))
      case _ => throw new IllegalArgumentException("graft_poly_hash(str, mod) takes 2 arguments")
    },
    descriptor("graft_dot_fold", classOf[DotFold]) {
      case Seq(a, b) => DotFold(a, b)
      case _ => throw new IllegalArgumentException("graft_dot_fold(a, b) takes 2 arguments")
    },
    descriptor("graft_shingle_hash", classOf[ShingleHash]) {
      case Seq(s, m, n) => ShingleHash(s, longLit(m, "graft_shingle_hash modulus"),
        longLit(n, "graft_shingle_hash arity").toInt)
      case _ => throw new IllegalArgumentException(
        "graft_shingle_hash(str, mod, arity) takes 3 arguments")
    },
    descriptor("graft_sign_proj_bits", classOf[SignProjBits]) {
      case Seq(v, n) => SignProjBits(v, longLit(n, "graft_sign_proj_bits nBits").toInt)
      case _ => throw new IllegalArgumentException(
        "graft_sign_proj_bits(vec, nBits) takes 2 arguments")
    },
    descriptor("graft_simhash16", classOf[SimHash16]) {
      case Seq(s) => SimHash16(s, 31L, 65536L)
      case Seq(s, mult, mod) => SimHash16(s, longLit(mult, "graft_simhash16 mult"),
        longLit(mod, "graft_simhash16 mod"))
      case _ => throw new IllegalArgumentException(
        "graft_simhash16(str[, mult, mod]) takes 1 or 3 arguments")
    },
    descriptor("graft_status_decode", classOf[StatusDecode]) {
      case Seq(s) => StatusDecode(s)
      case _ => throw new IllegalArgumentException("graft_status_decode(str) takes 1 argument")
    },
    descriptor("graft_struct_sort_join", classOf[StructSortJoin]) {
      case Seq(a, sep) => StructSortJoin(a, strLit(sep, "graft_struct_sort_join separator"))
      case _ => throw new IllegalArgumentException(
        "graft_struct_sort_join(arr, sep) takes 2 arguments")
    })

  /** Idempotent registration on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptors.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
