package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Session extension entry point (`spark.sql.extensions=graft.plans.
  * GraftExtensions` or `.withExtensions(new GraftExtensions)`):
  *
  *   - registers the codegen'd [[CosineSimilarity]] native expression as
  *     the SQL function `graft_cosine(a, b)`, making the hot vector
  *     kernel reachable from pure-SQL pipelines (not just the Scala
  *     [[graft.functions.Native.cosine]] Column helper);
  *   - injects [[RewriteHofCosine]], an optimizer `Rule[LogicalPlan]`
  *     that rewrites the declarative higher-order-function cosine
  *     (`aggregate(zip_with(a,b,(p,q)->p*q),0d,(acc,v)->acc+v) /
  *     sqrt(·) / sqrt(·)`, the [[graft.operators.Dedup.cosineCol]]
  *     shape) into the fused native expression — users who write the
  *     idiomatic declarative formula silently get the whole-stage-
  *     codegen kernel. Sound because the two implementations are
  *     bit-equal on ALL inputs including nulls and length mismatches
  *     (the contract asserted in PipelineOpsSpec).
  *
  * This is the SparkSessionExtensions integration tier the charter
  * prescribes for engine-level extensions (custom Expression + Rule
  * beats a UDF); the rule is deliberately conservative — any shape it
  * does not match EXACTLY is left untouched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_cosine expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_tokenize"),
      new ExpressionInfo(classOf[graft.functions.Tokenize].getName, "graft_tokenize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_tokenize expects 1 argument, got ${children.length}")
        graft.functions.Tokenize(children.head)
      }))
    ext.injectOptimizerRule(_ => RewriteHofCosine)
  }
}

/** Rewrites `dot(a,b) / sqrt(dot(a,a)) / sqrt(dot(b,b))` — with
  * `dot(x,y) = aggregate(zip_with(x, y, (p,q) -> double(p)*double(q)),
  * 0.0, (acc,v) -> acc+v)` — into [[CosineSimilarity]](a, b).
  * Fires only on float/double array inputs and only when all three dot
  * products reference the same two arrays; everything else is left as
  * written. */
object RewriteHofCosine extends Rule[LogicalPlan] {

  private def stripCastToDouble(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => stripCastToDouble(c.child)
    case _ => e
  }

  private def isFpArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** aggregate(zip_with(x, y, (p,q) -> p*q), 0.0, (acc,v) -> acc+v)
    * with an identity finish lambda → (x, y). */
  private object Dot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(x, y, LambdaFunction(mulBody, Seq(p, q), _)),
            Literal(zero, DoubleType),
            LambdaFunction(addBody, Seq(acc, v), _),
            LambdaFunction(finBody, Seq(fin), _))
          if zero == 0.0 &&
            finBody.semanticEquals(fin) &&
            (stripCastToDouble(addBody) match {
              case Add(l, r, _) =>
                (l.semanticEquals(acc) && r.semanticEquals(v)) ||
                  (l.semanticEquals(v) && r.semanticEquals(acc))
              case _ => false
            }) &&
            (stripCastToDouble(mulBody) match {
              case Multiply(l, r, _) =>
                stripCastToDouble(l).semanticEquals(p) &&
                  stripCastToDouble(r).semanticEquals(q)
              case _ => false
            }) =>
        Some((x, y))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(Divide(Dot(a, b), Sqrt(Dot(a2, a3)), _), Sqrt(Dot(b2, b3)), _)
          if a2.semanticEquals(a) && a3.semanticEquals(a) &&
            b2.semanticEquals(b) && b3.semanticEquals(b) &&
            isFpArray(a) && isFpArray(b) =>
        CosineSimilarity(a, b)
    }
}
