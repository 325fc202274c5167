package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule (SURVEY.md §2.10 ladder: custom `Rule[LogicalPlan]`)
  * that fuses the pure-built-in polynomial-hash fold
  *
  *   aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s,i,1))),
  *             0L, (h,x) -> (h*31 + x) % m)
  *
  * into the native [[PolyHash]] expression. The fold shape is what a user
  * writing the hash with public built-ins produces
  * ([[graft.ops.TextOps.charHashFold]]); higher-order functions evaluate
  * interpreted with ~20 expression nodes per character, while the fused
  * expression is one codegen'd loop — same result bit-for-bit (ASCII
  * input), order of magnitude faster.
  *
  * Registered through [[graft.GraftExtensions]] (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object PolyHashFusion extends Rule[LogicalPlan] {

  private def isOne(e: Expression): Boolean = e match {
    case l: Literal => l.value == 1
    case _ => false
  }
  private def isZero(e: Expression): Boolean = e match {
    case l: Literal => l.value == 0
    case _ => false
  }
  private def longValue(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  /** Matches the per-char projection lambda:
    * i -> cast(ascii(substring(s, i, 1)) as bigint); yields s.
    */
  private object CharProjection {
    def unapply(f: Expression): Option[Expression] = f match {
      case LambdaFunction(
          Cast(Ascii(Substring(s, iRef: NamedLambdaVariable, one)), LongType, _, _),
          Seq(iVar: NamedLambdaVariable), _)
          if isOne(one) && iRef.exprId == iVar.exprId =>
        Some(s)
      case _ => None
    }
  }

  /** Matches the merge lambda (h, x) -> (h*31 + x) % m; yields m. */
  private object MergeLambda {
    def unapply(f: Expression): Option[Long] = f match {
      case LambdaFunction(
          Remainder(Add(Multiply(hRef: NamedLambdaVariable, thirtyOne, _), xRef: NamedLambdaVariable, _), m, _),
          Seq(hVar: NamedLambdaVariable, xVar: NamedLambdaVariable), _)
          if longValue(thirtyOne).contains(31L) &&
            hRef.exprId == hVar.exprId && xRef.exprId == xVar.exprId =>
        longValue(m).filter(_ > 1)
      case _ => None
    }
  }

  private object IdentityFinish {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(body: NamedLambdaVariable, Seq(v: NamedLambdaVariable), _) =>
        body.exprId == v.exprId
      case _ => false
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ArrayTransform(Sequence(start, Length(s1), _, _), CharProjection(s2)),
        zero, MergeLambda(m), IdentityFinish())
        if isOne(start) && isZero(zero) && s1.semanticEquals(s2) =>
      PolyHash(s1, m)
  }
}
