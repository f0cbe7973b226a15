package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.operators.TextAnalysis

/** The DSv2 generator source: determinism, partitioning, column pruning,
  * and composition with the rest of the engine. */
class DocGenSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("docgen-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def gen(rows: Long, parts: Int = 4) =
    spark.read.format("docgen")
      .option("rows", rows).option("partitions", parts).load()

  test("generates exactly N rows across P partitions, deterministically") {
    val df = gen(10000, 8)
    assert(df.count() === 10000)
    assert(df.rdd.getNumPartitions === 8)
    val a = gen(100).orderBy("doc_id").collect().map(_.toSeq)
    val b = gen(100, 2).orderBy("doc_id").collect().map(_.toSeq)
    // same data regardless of partitioning — pure function of the index
    assert(a === b)
    assert(df.select(countDistinct("doc_id")).collect()(0).getLong(0) === 10000)
  }

  test("column pruning pushes into the scan") {
    val df = gen(1000).select("doc_id")
    df.collect()
    val ex = df.queryExecution.executedPlan.toString
    val scanLine = ex.linesIterator.find(_.contains("BatchScan docgen")).get
    assert(scanLine.contains("[doc_id#") && !scanLine.contains("text#"),
      s"text not pruned from generator scan: $scanLine")
  }

  test("n_chars matches the generated text") {
    val bad = gen(500)
      .filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad === 0)
  }

  test("generated corpus flows through engine operators") {
    val docs = gen(2000, 8)
    val q = TextAnalysis.quality(docs)
    assert(q.count() === 2000)
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() === 0)
    val top = TextAnalysis.topTerms(docs, 5).collect()
    assert(top.length === 5)
  }
}
