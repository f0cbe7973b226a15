package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Skew}

/** Salting must be a pure physical rewrite: identical results to the
  * unsalted formulation, with the hot key spread across partitions. */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("skew-spec").getOrCreate()
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  // 90% of rows share one hot key — the classic skew shape
  private lazy val skewed = spark.range(10000)
    .select((when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id"))).as("k"),
      col("id").as("v"))

  test("saltedJoin equals the plain join on skewed data") {
    val dim = Seq((1L, "hot"), (20L, "cold"), (30L, "cold2")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(plain.nonEmpty)
    assert(salted === plain)
  }

  test("saltedJoin spreads the hot key across salt shards") {
    val dim = Seq((1L, "hot")).toDF("k", "name")
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(
        (monotonically_increasing_id() +: skewed.columns.map(col).toSeq): _*),
        lit(8)))
    val shards = salted.filter(col("k") === 1L)
      .groupBy("_salt").count().collect()
    assert(shards.length > 4, s"hot key landed in only ${shards.length} shards")
  }

  test("fully duplicate hot rows still spread across salts") {
    // the degenerate hot-key shape: the hot rows are IDENTICAL, so a
    // content-only salt would put them all on one reducer
    val dups = spark.range(10000).select(lit(1L).as("k"), lit(7L).as("v"))
    val dim = Seq((1L, "hot")).toDF("k", "name")
    val joined = Skew.saltedJoin(dups, dim, "k", salts = 8)
    assert(joined.count() === 10000)
    val shards = dups.withColumn("_salt",
        pmod(xxhash64(
          (monotonically_increasing_id() +: dups.columns.map(col).toSeq): _*),
          lit(8)))
      .groupBy("_salt").count().collect()
    assert(shards.length === 8, s"duplicate rows collapsed onto ${shards.length} shards")
  }

  test("saltedJoin rejects right/full outer join types") {
    val dim = Seq((1L, "hot")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "k", salts = 8, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "k", salts = 8, joinType = "right")
    }
    // left outer stays legal: unmatched LEFT rows appear once (not replicated)
    val lo = Skew.saltedJoin(skewed, dim, "k", salts = 4, joinType = "left_outer")
    assert(lo.count() === skewed.count())
  }

  test("saltedDistinctCount equals exact countDistinct") {
    val exact = skewed.groupBy("k").agg(countDistinct("v").as("n_distinct"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Skew.saltedDistinctCount(skewed, "k", "v", salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted === exact)
  }
}
