package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotFold, PolyHash}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use, so
  * `spark.sql("SELECT graft_poly_hash(s, 65536) FROM t")` works — either
  * via `spark.sql.extensions=graft.GraftExtensions` or
  * [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.polyHashDescriptor)
    e.injectFunction(GraftExtensions.dotFoldDescriptor)
    e.injectOptimizerRule(_ => graft.functions.PolyHashFusion)
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

  private[graft] val polyHashDescriptor =
    (FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (children: Seq[Expression]) => children match {
        case Seq(s, m) => PolyHash(s, longLit(m, "graft_poly_hash modulus"))
        case _ => throw new IllegalArgumentException("graft_poly_hash(str, mod) takes 2 arguments")
      })

  private[graft] val dotFoldDescriptor =
    (FunctionIdentifier("graft_dot_fold"),
      new ExpressionInfo(classOf[DotFold].getName, "graft_dot_fold"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => DotFold(a, b)
        case _ => throw new IllegalArgumentException("graft_dot_fold(a, b) takes 2 arguments")
      })

  /** Idempotent registration on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    Seq(polyHashDescriptor, dotFoldDescriptor).foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
