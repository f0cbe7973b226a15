package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.sources.{AvroIO, Sources}
import graft.transform.ScriptTransform

/** Round-trip correctness of every source/sink format, on the real test
  * tables (doubles and timestamps must survive bit-for-bit). */
class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val dir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("sources-spec").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(): String = Files.createTempDirectory("graft-src").toString

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.orderBy("l_orderkey", "l_linenumber").collect().map(_.toString)

  test("orc round-trip preserves doubles and timestamps exactly") {
    val li = Tables.lineitem(spark, dir)
    val path = tmp() + "/li-orc"
    Sources.writeOrc(li, path)
    val back = Sources.orc(spark, path, li.schema)
    assert(sortedRows(back) === sortedRows(li))
  }

  test("csv round-trip preserves doubles and timestamps exactly") {
    val li = Tables.lineitem(spark, dir)
    val path = tmp() + "/li-csv"
    Sources.writeCsv(li, path)
    val back = Sources.csv(spark, path, li.schema)
    assert(sortedRows(back) === sortedRows(li))
  }

  test("avro container round-trip preserves doubles, timestamps, arrays and binary exactly") {
    // lineitem exercises long/int/double/string/date-ish columns
    val li = Tables.lineitem(spark, dir)
    val path = tmp() + "/li-avro"
    AvroIO.writeAvro(li, path)
    val back = AvroIO.readAvro(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      li.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(sortedRows(back) === sortedRows(li))
    // embeddings exercises array<double>; documents adds binary payloads
    val em = Tables.embeddings(spark, dir)
    val p2 = tmp() + "/em-avro"
    AvroIO.writeAvro(em, p2)
    val b2 = AvroIO.readAvro(spark, p2)
    assert(b2.orderBy("vec_id").collect().map(_.toString) ===
      em.orderBy("vec_id").collect().map(_.toString))
    import spark.implicits._
    val bin = Seq((1L, Array[Byte](1, 2, -3), new java.sql.Timestamp(123456789L)),
      (2L, Array[Byte](), new java.sql.Timestamp(0L)))
      .toDF("id", "payload", "ts")
    val p3 = tmp() + "/bin-avro"
    AvroIO.writeAvro(bin, p3)
    val b3 = AvroIO.readAvro(spark, p3).orderBy("id").collect()
    assert(b3(0).getAs[Array[Byte]](1).toSeq === Seq[Byte](1, 2, -3))
    assert(b3(0).getTimestamp(2).getTime === 123456789L)
    assert(b3(1).getAs[Array[Byte]](1).isEmpty)
  }

  test("avro enum/union/logical-type fidelity through the SchemaCodec mapping") {
    import org.apache.avro.{LogicalTypes, Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import graft.transform.SchemaCodec
    // hand-author an avro file a CDAP-style producer would emit: enum,
    // heterogeneous union [string, long], nullable union [null, double],
    // date + timestamp-micros logical types
    val schemaJson =
      """{"type":"record","name":"ev","namespace":"x","fields":[
        |{"name":"id","type":"long"},
        |{"name":"color","type":{"type":"enum","name":"col","symbols":["RED","GREEN","BLUE"]}},
        |{"name":"tag","type":["string","long"]},
        |{"name":"score","type":["null","double"]},
        |{"name":"d","type":{"type":"int","logicalType":"date"}},
        |{"name":"t","type":{"type":"long","logicalType":"timestamp-micros"}}
        |]}""".stripMargin.replace("\n", "")
    val aSchema = new ASchema.Parser().parse(schemaJson)
    val d = tmp()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](aSchema))
    w.create(aSchema, new java.io.File(d, "ev.avro"))
    def rec(id: Long, color: String, tag: AnyRef, score: java.lang.Double,
            days: Int, micros: Long): GenericRecord = {
      val r = new GenericData.Record(aSchema)
      r.put("id", id)
      r.put("color", new GenericData.EnumSymbol(aSchema.getField("color").schema(), color))
      r.put("tag", tag)
      r.put("score", score)
      r.put("d", days)
      r.put("t", micros)
      r
    }
    w.append(rec(1L, "GREEN", "alpha", 2.5, 19000, 1700000000123456L))
    w.append(rec(2L, "RED", java.lang.Long.valueOf(77L), null, 0, 0L))
    w.close()
    val df = AvroIO.readAvro(spark, d)
    // schema lands as the repo's one union/enum story
    val colorField = df.schema("color")
    assert(SchemaCodec.isEnumField(colorField))
    assert(SchemaCodec.enumSymbols(colorField).toSeq === Seq("RED", "GREEN", "BLUE"))
    val tagField = df.schema("tag")
    assert(SchemaCodec.isUnionField(tagField))
    assert(df.schema("score").nullable)
    assert(df.schema("d").dataType === org.apache.spark.sql.types.DateType)
    assert(df.schema("t").dataType === org.apache.spark.sql.types.TimestampType)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) === "GREEN")
    assert(rows(0).getStruct(2).getString(0) === "alpha") // member0 = string branch
    assert(rows(0).getDouble(3) === 2.5)
    assert(rows(0).getDate(4).toLocalDate.toEpochDay === 19000L)
    assert(org.apache.spark.sql.functions.lit(0) != null) // keep import used
    assert(rows(1).getStruct(2).isNullAt(0) && rows(1).getStruct(2).getLong(1) === 77L)
    assert(rows(1).isNullAt(3))
    // timestamp survives at micros precision
    val t0 = rows(0).getTimestamp(5)
    assert(t0.getTime === 1700000000123L && t0.getNanos === 123456000)
    // and the round trip back out through writeAvro re-reads identically
    val p2 = tmp() + "/rt"
    AvroIO.writeAvro(df, p2)
    val back = AvroIO.readAvro(spark, p2)
    assert(back.orderBy("id").collect().map(_.toString) ===
      rows.map(_.toString))
    assert(SchemaCodec.isEnumField(back.schema("color")) &&
      SchemaCodec.isUnionField(back.schema("tag")))
  }

  test("avro timestamp-millis decodes correctly at every nesting depth") {
    import org.apache.avro.{Schema => ASchema}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // millis-precision writers nest the logical type inside arrays, map
    // values, a union branch, and a sub-record — each must decode at the
    // same instant a top-level millis field does (not 1000x off)
    val schemaJson =
      """{"type":"record","name":"mev","namespace":"x","fields":[
        |{"name":"id","type":"long"},
        |{"name":"top","type":{"type":"long","logicalType":"timestamp-millis"}},
        |{"name":"arr","type":{"type":"array","items":{"type":"long","logicalType":"timestamp-millis"}}},
        |{"name":"m","type":{"type":"map","values":{"type":"long","logicalType":"timestamp-millis"}}},
        |{"name":"u","type":["string",{"type":"long","logicalType":"timestamp-millis"}]},
        |{"name":"sub","type":{"type":"record","name":"subr","fields":[
        |  {"name":"st","type":{"type":"long","logicalType":"timestamp-millis"}}]}}
        |]}""".stripMargin.replace("\n", "")
    val aSchema = new ASchema.Parser().parse(schemaJson)
    val d = tmp()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](aSchema))
    w.create(aSchema, new java.io.File(d, "mev.avro"))
    val ms = 1700000000123L // one instant, written as millis everywhere
    val r = new GenericData.Record(aSchema)
    r.put("id", 1L)
    r.put("top", ms)
    r.put("arr", java.util.List.of(java.lang.Long.valueOf(ms)))
    r.put("m", java.util.Map.of("k", java.lang.Long.valueOf(ms)))
    r.put("u", java.lang.Long.valueOf(ms))
    val sub = new GenericData.Record(aSchema.getField("sub").schema())
    sub.put("st", ms)
    r.put("sub", sub)
    w.append(r)
    w.close()
    val rows = AvroIO.readAvro(spark, d).collect()
    val row = rows(0)
    assert(row.getTimestamp(1).getTime === ms, "top-level millis")
    assert(row.getSeq[java.sql.Timestamp](2).head.getTime === ms,
      "array<timestamp-millis> element")
    assert(row.getMap[String, java.sql.Timestamp](3)("k").getTime === ms,
      "map value timestamp-millis")
    val u = row.getStruct(4)
    assert(u.isNullAt(0) && u.getTimestamp(1).getTime === ms,
      "union branch timestamp-millis")
    assert(row.getStruct(5).getTimestamp(0).getTime === ms,
      "nested record timestamp-millis")
  }

  test("json-lines round-trip preserves the full schema") {
    val li = Tables.lineitem(spark, dir)
    val path = tmp() + "/li-json"
    Sources.writeJsonLines(li, path)
    val back = Sources.jsonLines(spark, path, li.schema)
    assert(sortedRows(back) === sortedRows(li))
  }

  test("partitioned parquet sink prunes by partition value") {
    val li = Tables.lineitem(spark, dir)
    val path = tmp() + "/li-part"
    Sources.writeParquet(li, path, partitionBy = Seq("l_returnflag"))
    val back = Sources.parquet(spark, path).filter(col("l_returnflag") === "R")
    // partition pruning: only the R directory is listed
    val scanned = back.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"no partition filter in:\n$scanned")
    assert(back.count() === li.filter(col("l_returnflag") === "R").count())
  }

  test("writeSorted produces disjoint key ranges per file") {
    val li = Tables.lineitem(spark, dir)
    val path = tmp() + "/li-sorted"
    Sources.writeSorted(li, path, Seq("l_shipdate"))
    val back = Sources.parquet(spark, path)
    assert(back.count() === li.count())
    // each file covers a disjoint shipdate range (file-level min/max from
    // the data itself, via input_file_name grouping)
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1), r.getAs[java.time.LocalDateTime](2)))
      .sortBy(_._1.toString)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(!hi1.isAfter(lo2))
      case _ => ()
    }
  }

  test("training export: shard-partitioned files carry the tape order in-file") {
    import graft.operators.Sampling
    // the trainer contract: each shard is one file whose physical row
    // order IS the deterministic tape order — a data-parallel reader
    // streams its shard sequentially with no sort at read time
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val out = Sampling.shuffleExport(docs, col("doc_id"), nShards = 4)
    val d = tmp()
    out.repartition(col("shard")).sortWithinPartitions("shard", "pos")
      .write.partitionBy("shard").mode("overwrite").parquet(d)
    val total = (0 until 4).map { s =>
      val rows = spark.read.parquet(s"$d/shard=$s")
        .select("pos", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // positions arrive 1..n in file order, no read-time sort
      assert(rows.map(_._1).toSeq === (1L to rows.length).toSeq,
        s"shard $s not in tape order on disk")
      rows.length
    }.sum
    assert(total === docs.count(), "export lost rows")
  }

  test("bucketed tables join with no exchange (co-located join)") {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    // the in-memory catalog forgets tables across JVMs but warehouse files
    // persist — clear stale locations from previous runs
    Seq("li_b", "ord_b").foreach { t =>
      val loc = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Sources.writeBucketed(li, "li_b", "l_orderkey", 8)
    Sources.writeBucketed(ord, "ord_b", "o_orderkey", 8)
    // disable broadcast so the test exercises the shuffle-join path the
    // bucketing is supposed to eliminate (at real scale neither side
    // broadcasts anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val ex = joined.queryExecution.executedPlan.toString
      assert(ex.contains("SortMergeJoin") || ex.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join:\n$ex")
      // the whole point: neither side shuffles — bucketing pre-partitioned them
      assert(!ex.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$ex")
      assert(joined.count() ===
        li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("writeChannels materializes out/errors/alerts from one pass") {
    val df = spark.range(10).toDF("id")
    val out = StructType(Seq(StructField("id", LongType)))
    val result = ScriptTransform(df, out) { (r, em, _) =>
      val id = r("id").asInstanceOf[Long]
      if (id % 3 == 0) em.emitError(1, "div3", r)
      else em.emit(r)
      if (id == 9) em.emitAlert(Map("last" -> "true"))
    }
    val base = tmp() + "/channels"
    Sources.writeChannels(result, base)
    assert(spark.read.parquet(s"$base/out").count() === 6)
    assert(spark.read.parquet(s"$base/errors").count() === 4)
    assert(spark.read.parquet(s"$base/alerts").count() === 1)
  }

  test("raw-text ingestion: line mode splits, wholetext is one doc per file, both carry lineage") {
    val d = tmp()
    Files.write(java.nio.file.Paths.get(d, "a.txt"),
      "first line\nsecond line\n".getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(d, "b.txt"),
      "only line of b".getBytes("UTF-8"))
    val lines = Sources.rawText(spark, d)
    assert(lines.count() === 3)
    // provenance: every row knows its source file
    val byFile = lines.groupBy("src_file").count().collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1))).toMap
    assert(byFile === Map("a.txt" -> 2L, "b.txt" -> 1L))
    val docs = Sources.rawText(spark, d, wholeFile = true)
    val aDoc = docs.filter(col("src_file").endsWith("a.txt"))
      .select("text").collect().head.getString(0)
    assert(docs.count() === 2)
    assert(aDoc === "first line\nsecond line\n")
  }

  test("gzip-compressed text and json-lines ingest transparently with lineage") {
    // crawl dumps arrive gzipped; Spark's text/json readers decode .gz
    // transparently. A .gz file is NOT splittable — it reads as one
    // task — so the 100 TB layout answer is many files (task grain =
    // file grain), which this exercises with two archives.
    val d = tmp()
    def gz(name: String, content: String): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(new java.io.File(d, name)))
      out.write(content.getBytes("UTF-8")); out.close()
    }
    gz("a.txt.gz", "alpha one\nalpha two\n")
    gz("b.txt.gz", "beta one\n")
    val lines = Sources.rawText(spark, d)
    assert(lines.count() === 3)
    val byFile = lines.groupBy("src_file").count().collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1))).toMap
    assert(byFile === Map("a.txt.gz" -> 2L, "b.txt.gz" -> 1L))
    // schema-explicit gzipped json-lines round-trip (no inference pass)
    val li = Tables.lineitem(spark, dir).filter(col("l_orderkey") < 100)
    val jd = tmp() + "/li-json-gz"
    li.write.option("compression", "gzip").json(jd)
    val back = spark.read.schema(li.schema).json(jd)
    assert(sortedRows(back) === sortedRows(li))
  }

  test("binary-file ingestion feeds the multimodal decode path; glob narrows modality") {
    val d = tmp()
    val png = graft.operators.Multimodal.makePng(42L)
    Files.write(java.nio.file.Paths.get(d, "img.png"), png)
    Files.write(java.nio.file.Paths.get(d, "junk.bin"), Array[Byte](1, 2, 3))
    val all = Sources.binaryFiles(spark, d)
    assert(all.count() === 2)
    val imgs = Sources.binaryFiles(spark, d, glob = "*.png")
    val row = imgs.select("content", "length").collect().head
    assert(row.getAs[Array[Byte]](0).sameElements(png))
    assert(row.getLong(1) === png.length.toLong)
    // the read bytes decode exactly like an in-table binary column
    val meta = graft.operators.Multimodal.extractMeta(
        imgs.select(lit(42L).as("doc_id"), col("content").as("payload")))
      .select("media_type", "width", "height").collect().head
    assert(meta.getString(0) === "image/png")
    assert(meta.getInt(1) > 0 && meta.getInt(2) > 0)
  }
}
