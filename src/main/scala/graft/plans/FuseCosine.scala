package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.CosineSim

/** Optimizer-rule extension tier (`injectOptimizerRule`): rewrite the
  * composed cosine-similarity expression
  *
  *   aggregate(zip_with(a, b, (x, y) => x·y), 0.0, +)
  *     / (sqrt(aggregate(zip_with(a, a, ...), 0.0, +))
  *        * sqrt(aggregate(zip_with(b, b, ...), 0.0, +)))
  *
  * into the fused native [[CosineSim]] — one allocation-free codegen loop
  * instead of three array walks and a per-row zipped intermediate. This is
  * algebraic fusion across higher-order functions, which Catalyst's own
  * rewrites never attempt; the substitution is exact because CosineSim sums
  * left-to-right like the composed form (NativeSpec pins bit-equality).
  *
  * Users (and composed library code like `Similarity.cosineComposed`) write
  * the declarative form; sessions built with `GraftExtensions` — or with
  * [[FuseCosine.register]] on an existing session — get the fused plan
  * automatically.
  */
object FuseCosineRule extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case _ => e
  }

  /** Matches `aggregate(zip_with(x, y, (p,q) => p*q), 0.0, (s,v) => s+v)`
    * with the default identity finish lambda, yielding (x, y). */
  private object DotOf {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(x, y,
            LambdaFunction(mul, Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add, Seq(s: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(f: NamedLambdaVariable), _)) =>
        val mulOk = stripCast(mul) match {
          case Multiply(l, r, _) => (stripCast(l), stripCast(r)) match {
            case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
              lv.exprId == p.exprId && rv.exprId == q.exprId
            case _ => false
          }
          case _ => false
        }
        val addOk = add match {
          case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
            l.exprId == s.exprId && r.exprId == v.exprId
          case _ => false
        }
        val finOk = fin match {
          case fv: NamedLambdaVariable => fv.exprId == f.exprId
          case _ => false
        }
        if (mulOk && addOk && finOk) Some((x, y)) else None
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotOf(a, b),
        Multiply(Sqrt(DotOf(a1, a2)), Sqrt(DotOf(b1, b2)), _), _)
        if a.semanticEquals(a1) && a1.semanticEquals(a2) &&
          b.semanticEquals(b1) && b1.semanticEquals(b2) &&
          isFloatArray(a) && isFloatArray(b) =>
      CosineSim(a, b)
  }
}

object FuseCosine {
  /** Idempotently attach the rule to an existing session (the
    * `GraftExtensions`-less path, mirroring `TopK.perKey`'s strategy
    * registration). */
  def register(spark: SparkSession): Unit = FuseCosine.synchronized {
    if (!spark.experimental.extraOptimizations.contains(FuseCosineRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseCosineRule
  }
}
