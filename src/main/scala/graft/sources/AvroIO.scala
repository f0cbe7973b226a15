package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

import graft.transform.SchemaCodec

/** Avro object-container I/O over the core `org.apache.avro` library
  * (on the classpath with every Spark distribution; the sandbox has no
  * spark-avro connector, so the container read/write is implemented
  * directly — same per-file parallelism model as the connector).
  *
  * The reference's StructuredRecord model is Avro-derived (ref:
  * PythonObjectsEncoder.java handles UNION/ENUM/BYTES/logical types),
  * and CDAP pipelines read and write `.avro` containers constantly —
  * this closes that endpoint with FULL fidelity to the repo's one union
  * story: Avro `[null, T]` ≡ nullable column, heterogeneous unions ≡
  * [[SchemaCodec.unionField]] struct-of-options, enums ≡
  * [[SchemaCodec.enumField]] string-with-symbols, logical
  * date/timestamp-micros/decimal ≡ DateType/TimestampType/DecimalType.
  *
  * Scale shape: one Avro container file = one task (Avro blocks are
  * splittable in principle; file-grain is the simple correct unit and
  * matches how export jobs shard anyway — write N files, read N tasks).
  * Readers take the writer schema from the FIRST file's header on the
  * driver (a header read, not a data pass) or an explicit schema.
  */
object AvroIO {

  // ---- schema conversion ----------------------------------------------

  private val NullSchema = ASchema.create(ASchema.Type.NULL)

  /** Spark → Avro. Nullable fields become `[null, T]` unions;
    * [[SchemaCodec]] enum/union markers become real Avro enum/union
    * types, so a Graft round trip preserves what the reference's
    * Avro-derived model expresses. */
  def toAvroSchema(st: StructType, name: String = "row",
                   namespace: String = "graft"): ASchema = {
    val fields = st.fields.zipWithIndex.map { case (f, i) =>
      val base =
        if (SchemaCodec.isEnumField(f))
          ASchema.createEnum(s"${name}_${f.name}_enum", null, namespace,
            SchemaCodec.enumSymbols(f).toList.asJava)
        else if (SchemaCodec.isUnionField(f))
          ASchema.createUnion(
            (NullSchema +: f.dataType.asInstanceOf[StructType].fields
              .zipWithIndex.map { case (bf, bi) =>
                nonNullSchema(bf.dataType, s"${name}_${f.name}_b$bi", namespace)
              }.toSeq).asJava)
        else nonNullSchema(f.dataType, s"${name}_${f.name}", namespace)
      val sch =
        if (SchemaCodec.isUnionField(f) || !f.nullable) base
        else ASchema.createUnion(java.util.List.of(NullSchema, base))
      new ASchema.Field(f.name, sch, null, null)
    }
    val rec = ASchema.createRecord(name, null, namespace, false)
    rec.setFields(java.util.List.of(fields: _*))
    rec
  }

  private def nonNullSchema(dt: DataType, name: String,
                            ns: String): ASchema = dt match {
    case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => ASchema.create(ASchema.Type.INT)
    case LongType => ASchema.create(ASchema.Type.LONG)
    case FloatType => ASchema.create(ASchema.Type.FLOAT)
    case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
    case StringType => ASchema.create(ASchema.Type.STRING)
    case BinaryType => ASchema.create(ASchema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros()
        .addToSchema(ASchema.create(ASchema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(ASchema.create(ASchema.Type.BYTES))
    case ArrayType(e, containsNull) =>
      val el = nonNullSchema(e, s"${name}_item", ns)
      ASchema.createArray(
        if (containsNull) ASchema.createUnion(java.util.List.of(NullSchema, el))
        else el)
    case MapType(StringType, v, valueContainsNull) =>
      val vs = nonNullSchema(v, s"${name}_value", ns)
      ASchema.createMap(
        if (valueContainsNull)
          ASchema.createUnion(java.util.List.of(NullSchema, vs))
        else vs)
    case st: StructType => toAvroSchema(st, name, ns)
    case other =>
      throw new IllegalArgumentException(s"avro: unsupported Spark type $other")
  }

  /** Avro → Spark, the inverse mapping (enums/heterogeneous unions land
    * as the marked SchemaCodec fields, so everything downstream — the
    * script codec included — treats file-borne and pipeline-borne
    * unions identically). */
  def toSparkSchema(s: ASchema): StructType = {
    require(s.getType == ASchema.Type.RECORD, s"not a record schema: $s")
    StructType(s.getFields.asScala.toSeq.map { f =>
      fieldFor(f.name(), f.schema())
    })
  }

  private def fieldFor(name: String, s: ASchema): StructField = s.getType match {
    case ASchema.Type.ENUM =>
      SchemaCodec.enumField(name, s.getEnumSymbols.asScala.toSeq)
    case ASchema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
      if (branches.length == 1)
        fieldFor(name, branches.head).copy(nullable = true)
      else
        SchemaCodec.unionField(name, branches.map(sparkTypeOf).toSeq)
    case ASchema.Type.LONG
        if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] =>
      // mark millis-precision writers so value decode scales correctly
      StructField(name, TimestampType, nullable = false,
        new MetadataBuilder().putBoolean(TsMillisMarker, true).build())
    case _ =>
      StructField(name, sparkTypeOf(s), nullable = false)
  }

  private val TsMillisMarker = "graft.avro.tsMillis"

  private def sparkTypeOf(s: ASchema): DataType = s.getType match {
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else IntegerType
    case ASchema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
        TimestampType
      case _: LogicalTypes.LocalTimestampMicros => TimestampNTZType
      case _ => LongType
    }
    case ASchema.Type.FLOAT => FloatType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.STRING => StringType
    case ASchema.Type.ENUM => StringType
    case ASchema.Type.BYTES | ASchema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case ASchema.Type.ARRAY =>
      val el = s.getElementType
      val (et, nullable) = unwrapNullable(el)
      ArrayType(sparkTypeOf(et), containsNull = nullable)
    case ASchema.Type.MAP =>
      val (vt, nullable) = unwrapNullable(s.getValueType)
      MapType(StringType, sparkTypeOf(vt), valueContainsNull = nullable)
    case ASchema.Type.RECORD => toSparkSchema(s)
    case ASchema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
      if (branches.length == 1) sparkTypeOf(branches.head)
      else SchemaCodec.unionType(branches.map(sparkTypeOf).toSeq)
    case other =>
      throw new IllegalArgumentException(s"avro: unsupported Avro type $other")
  }

  private def unwrapNullable(s: ASchema): (ASchema, Boolean) =
    if (s.getType == ASchema.Type.UNION) {
      val nn = s.getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
      if (nn.length == 1) (nn.head, true) else (s, true)
    } else (s, false)

  // ---- value conversion -----------------------------------------------

  /** Decode one field value. `sch` is the field's WRITER schema (possibly a
    * nullable union); it travels with the value so logical-type precision
    * (timestamp-millis vs -micros) is honored at ANY nesting depth — record
    * fields, array elements, map values, and heterogeneous-union branches
    * all consult the writer schema, not just top-level fields. */
  private def toSpark(v: Any, f: StructField, sch: ASchema): Any =
    if (SchemaCodec.isUnionField(f)) unionToRow(v, f, sch)
    else toSparkValue(v, f.dataType, nonNullOf(sch))

  /** Strip the `null` branch off a nullable union; identity otherwise. */
  private def nonNullOf(sch: ASchema): ASchema =
    if (sch != null && sch.getType == ASchema.Type.UNION) {
      val nn = sch.getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
      if (nn.length == 1) nn.head else sch
    } else sch

  private def unionToRow(v: Any, f: StructField, sch: ASchema): Any = {
    if (v == null) return null
    val ut = f.dataType.asInstanceOf[StructType]
    // non-null avro branches are positionally the marked struct's fields
    // (fieldFor built the struct from exactly this filtered list)
    val branches: Seq[ASchema] =
      if (sch != null && sch.getType == ASchema.Type.UNION)
        sch.getTypes.asScala.filter(_.getType != ASchema.Type.NULL).toSeq
      else Seq.fill(ut.fields.length)(null)
    // resolve branch by the same first-runtime-match rule SchemaCodec
    // applies on encode — convert each candidate, first success wins
    val idx = ut.fields.indexWhere(bf => runtimeMatches(v, bf.dataType))
    require(idx >= 0, s"avro union value $v matches no branch of $ut")
    Row.fromSeq(ut.fields.indices.map(i =>
      if (i == idx) toSparkValue(v, ut.fields(idx).dataType, branches(idx))
      else null))
  }

  private def runtimeMatches(v: Any, dt: DataType): Boolean = (v, dt) match {
    case (_: java.lang.Boolean, BooleanType) => true
    case (_: java.lang.Integer, IntegerType) => true
    case (_: java.lang.Long, LongType) => true
    case (_: java.lang.Long, TimestampType | TimestampNTZType) => true
    case (_: java.lang.Integer, DateType) => true
    case (_: java.lang.Float, FloatType) => true
    case (_: java.lang.Double, DoubleType) => true
    case (_: CharSequence, StringType) => true
    case (_: GenericData.EnumSymbol, StringType) => true
    case (_: ByteBuffer, BinaryType) => true
    case (_: GenericData.Fixed, BinaryType) => true
    case (_: java.util.Collection[_], _: ArrayType) => true
    case (_: java.util.Map[_, _], _: MapType) => true
    case (_: GenericRecord, _: StructType) => true
    case _ => false
  }

  /** `sch` is the writer schema for this position (never a nullable union —
    * callers unwrap first; null only when writer schema is unavailable, in
    * which case longs are assumed micros, the container default). */
  private def toSparkValue(v: Any, dt: DataType, sch: ASchema): Any = (v, dt) match {
    case (null, _) => null
    case (s: CharSequence, StringType) => s.toString
    case (e: GenericData.EnumSymbol, StringType) => e.toString
    case (b: ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (f: GenericData.Fixed, BinaryType) => f.bytes().clone()
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) =>
      // the WRITER schema decides millis vs micros, at any nesting depth
      val micros =
        if (sch != null &&
          sch.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis])
          Math.multiplyExact(l.longValue(), 1000L)
        else l.longValue()
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(l, 1000000L),
        (Math.floorMod(l, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case (b: ByteBuffer, d: DecimalType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out)
      new java.math.BigDecimal(new java.math.BigInteger(out), d.scale)
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      val elSch = if (sch == null) null else nonNullOf(sch.getElementType)
      c.asScala.map(toSparkValue(_, et, elSch)).toSeq
    case (m: java.util.Map[_, _], MapType(StringType, vt, _)) =>
      val vSch = if (sch == null) null else nonNullOf(sch.getValueType)
      m.asScala.map { case (k, mv) =>
        k.toString -> toSparkValue(mv, vt, vSch)
      }.toMap
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.map { f =>
        val af = if (sch == null) null else sch.getField(f.name)
        toSpark(r.get(f.name), f, if (af == null) null else af.schema())
      }.toSeq)
    case (x, _) => x
  }

  private def toAvro(v: Any, f: StructField, sch: ASchema): Any = {
    val fieldSchema =
      if (f.nullable && !SchemaCodec.isUnionField(f) &&
        sch.getType == ASchema.Type.UNION)
        sch.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
      else sch
    if (SchemaCodec.isUnionField(f)) {
      if (v == null) return null
      val ut = f.dataType.asInstanceOf[StructType]
      val row = v.asInstanceOf[Row]
      val idx = row.toSeq.indexWhere(_ != null)
      if (idx < 0) return null
      // branch i of the marked struct is branch i+1 of the avro union
      // (null leads)
      toAvroValue(row.get(idx), ut.fields(idx).dataType,
        sch.getTypes.get(idx + 1))
    } else if (v == null) null
    else if (SchemaCodec.isEnumField(f))
      new GenericData.EnumSymbol(fieldSchema, v.toString)
    else toAvroValue(v, f.dataType, fieldSchema)
  }

  private def toAvroValue(v: Any, dt: DataType, sch: ASchema): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => s
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (t: java.sql.Timestamp, TimestampType) =>
      Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L) +
        t.getNanos / 1000L
    case (t: java.time.LocalDateTime, TimestampNTZType) =>
      Math.multiplyExact(t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L) +
        t.getNano / 1000L
    case (d: java.math.BigDecimal, dec: DecimalType) =>
      ByteBuffer.wrap(d.setScale(dec.scale).unscaledValue().toByteArray)
    case (d: Decimal, dec: DecimalType) =>
      toAvroValue(d.toJavaBigDecimal, dec, sch)
    case (s: scala.collection.Seq[_], ArrayType(et, containsNull)) =>
      val elSchema =
        if (containsNull)
          sch.getElementType.getTypes.asScala
            .find(_.getType != ASchema.Type.NULL).get
        else sch.getElementType
      s.map(e => toAvroValue(e, et, elSchema)).asJava
    case (m: scala.collection.Map[_, _], MapType(StringType, vt, vNull)) =>
      val vSchema =
        if (vNull) sch.getValueType.getTypes.asScala
          .find(_.getType != ASchema.Type.NULL).get
        else sch.getValueType
      m.map { case (k, mv) =>
        k.toString -> toAvroValue(mv, vt, vSchema)
      }.toMap.asJava
    case (r: Row, st: StructType) =>
      val rec = new GenericData.Record(sch)
      st.fields.zipWithIndex.foreach { case (f, i) =>
        rec.put(f.name, toAvro(r.get(i), f, sch.getField(f.name).schema()))
      }
      rec
    case (x, _) => x // primitives pass through (Int/Long/Float/Double/Boolean)
  }

  // ---- read / write ---------------------------------------------------

  /** Read a directory (or single file) of `.avro` containers. Schema
    * comes from the first file's HEADER (driver-side, no data pass)
    * unless given; file = task. */
  def readAvro(spark: SparkSession, path: String,
               schema: Option[StructType] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
      else Seq(path)
    require(files.nonEmpty, s"no .avro files under $path")
    val sparkSchema = schema.getOrElse {
      val in = fs.open(new HPath(files.head))
      val r = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try toSparkSchema(r.getSchema) finally { r.close(); in.close() }
    }
    val parallelism = math.min(files.length,
      spark.sparkContext.defaultParallelism)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(parallelism, 1))
      .flatMap { file =>
        val fs = new HPath(file).getFileSystem(new Configuration())
        val in = fs.open(new HPath(file))
        val reader = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          private var open = true
          override def hasNext: Boolean = {
            if (!open) return false
            val h = reader.hasNext
            if (!h) { reader.close(); in.close(); open = false }
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            val recSchema = rec.getSchema
            new GenericRowWithSchema(
              sparkSchema.fields.map { f =>
                val af = recSchema.getField(f.name)
                toSpark(rec.get(f.name), f,
                  if (af == null) null else af.schema())
              },
              sparkSchema)
          }
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Write `df` as a directory of Avro container files, one per
    * partition (empty partitions skipped), overwriting `path`. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema).toString
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val avroSchema = new ASchema.Parser().parse(avroJson)
        val part = TaskContext.getPartitionId()
        val outPath = new HPath(path, f"part-$part%05d.avro")
        val fs = outPath.getFileSystem(new Configuration())
        val out = fs.create(outPath, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        writer.create(avroSchema, out)
        try {
          rows.foreach { r =>
            val rec = new GenericData.Record(avroSchema)
            sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
              rec.put(f.name,
                toAvro(r.get(i), f, avroSchema.getField(f.name).schema()))
            }
            writer.append(rec)
          }
        } finally { writer.close() }
      }
    }
  }
}
