package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}

/** The typed Dataset[T] face of the engine: case-class encoders over the
  * same tables, compile-time field access, and agreement with the
  * untyped DataFrame formulation (same Catalyst plans underneath). */
case class Doc(doc_id: Long, text: String, lang: String, source: String,
               n_chars: Long)
case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                 o_totalprice: Double)

class TypedApiSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("typed-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("tables load as typed Datasets and filter with lambdas") {
    import spark.implicits._
    val docs: Dataset[Doc] = Tables.documents(spark, dir).as[Doc]
    val long = docs.filter(_.n_chars > 300)
    assert(long.count() ===
      Tables.documents(spark, dir).filter(col("n_chars") > 300).count())
    // typed map keeps the Dataset world
    val langs = long.map(_.lang).distinct().collect().sorted
    assert(langs.nonEmpty && langs.forall(Set("en", "es", "fr", "de", "zh")))
  }

  test("typed groupByKey aggregation equals the DataFrame groupBy") {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Order]
    val typedAgg = orders.groupByKey(_.o_orderstatus)
      .mapGroups((k, rows) => (k, rows.map(_.o_orderkey).sum))
      .collect().toMap
    val untyped = Tables.orders(spark, dir)
      .groupBy("o_orderstatus").agg(sum("o_orderkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typedAgg === untyped)
  }
}
