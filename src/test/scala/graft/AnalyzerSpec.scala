package graft

import graft.functions.Analyzer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {

  test("tokenize fixtures (FIXTURES.md §2)") {
    assert(Analyzer.tokenize("Hash JOIN  order") == Seq("hash", "join", "order"))
    assert(Analyzer.tokenize("  batch\tbatch\nbatch ") == Seq("batch", "batch", "batch"))
    assert(Analyzer.tokenize("spark-sql_4.1") == Seq("spark", "sql", "4", "1"))
    assert(Analyzer.tokenize("") == Seq.empty)
    assert(Analyzer.tokenize("\t \n") == Seq.empty)
  }

  test("queryTerms: distinct + ascending (rank-identity association order)") {
    assert(Analyzer.queryTerms("Sort ORDER sort") == Seq("order", "sort"))
    assert(Analyzer.queryTerms("table scan merge") == Seq("merge", "scan", "table"))
  }

  test("column tokenizer ≡ Scala tokenizer on corpus sample") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val docs = Corpus.docs(spark, SparkFixture.Sf0001).limit(50)
    val colSide = docs.select(col("docID"), Analyzer.tokensCol(col("content")).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val scalaSide = docs.select(col("docID"), col("content"))
      .as[(Long, String)].collect()
      .map { case (id, c) => id -> Analyzer.tokenize(c) }.toMap
    assert(colSide == scalaSide)
  }
}
