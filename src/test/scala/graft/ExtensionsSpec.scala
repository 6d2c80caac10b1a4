package graft

import graft.functions.{CosineSimilarity, Native}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions integration (graft.plans.GraftExtensions):
  * the native cosine as a SQL function, and the optimizer rule that
  * rewrites the declarative higher-order-function cosine into it. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  test("graft_cosine is registered as a SQL function") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    // null semantics match the native expression: length mismatch → null
    val n = spark.sql(
      "SELECT graft_cosine(array(1.0D), array(1.0D, 2.0D)) AS c").head()
    assert(n.isNullAt(0), "length mismatch must yield null")
  }

  test("RewriteHofCosine: declarative HOF cosine optimizes to the native kernel") {
    // arrays must depend on a non-local source: a Seq-backed DF is
    // eagerly collapsed by ConvertToLocalRelation and the optimized
    // plan would be a bare LocalRelation with nothing to inspect
    val base = spark.range(1, 4).select(
      array(col("id").cast("float"), lit(2.0f), (col("id") * 3).cast("float")).as("a"),
      array(lit(0.5f), col("id").cast("float"), (col("id") - 5).cast("float")).as("b"))
    val hof = base.select(Dedup.cosineCol(col("a"), col("b")).as("c"))
    assert(hof.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[CosineSimilarity])),
      s"HOF cosine not rewritten:\n${hof.queryExecution.optimizedPlan}")
    // and the rewrite is bit-transparent vs the explicit native call
    val native = base.select(Native.cosine(col("a"), col("b")).as("c"))
    assert(hof.collect().map(_.getDouble(0)).toSeq ==
      native.collect().map(_.getDouble(0)).toSeq)
  }

  test("rule is conservative: a NON-cosine aggregate shape is left alone") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(2.0, 4.0))).toDF("a", "b")
      .select(
        (aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
          lit(0.0), (acc, v) => acc + v) /
          sqrt(aggregate(zip_with(col("a"), col("a"), (p, q) => p * q),
            lit(0.0), (acc, v) => acc + v))).as("half"))
    assert(!df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[CosineSimilarity])),
      "partial (non-cosine) shape must not be rewritten")
  }
}
