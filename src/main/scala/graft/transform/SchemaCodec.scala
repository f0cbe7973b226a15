package graft.transform

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Row ↔ Map codec for the imperative script path.
  *
  * The reference crosses the engine/script boundary with a typed codec
  * covering NULL, BOOLEAN, INT, LONG, FLOAT, DOUBLE, BYTES, STRING, ARRAY,
  * MAP, RECORD (ref: PythonObjectsEncoder.java). Graft's equivalent maps
  * Spark's external row types to plain Scala collections so user closures
  * see `Map[String, Any]` records, and encodes emitted maps back to Rows
  * under a declared output schema (with forgiving numeric coercion, since
  * script code is dynamically typed).
  */
object SchemaCodec {

  /** External row value → plain Scala value (structs → Map, arrays → Seq). */
  def decode(value: Any, dt: DataType): Any = (value, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) => rowToMap(r, st)
    case (s: scala.collection.Seq[_], ArrayType(et, _)) =>
      s.map(decode(_, et)).toSeq
    case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
      m.map { case (k, v) => decode(k, kt) -> decode(v, vt) }.toMap
    case (v, _) => v
  }

  def rowToMap(row: Row, schema: StructType): Map[String, Any] = {
    val b = Map.newBuilder[String, Any]
    var i = 0
    while (i < schema.length) {
      b += schema(i).name -> decode(row.get(i), schema(i).dataType)
      i += 1
    }
    b.result()
  }

  /** Scala value → external row value under the declared type, coercing
    * numerics the way a dynamically-typed script expects. */
  def encode(value: Any, dt: DataType): Any = (value, dt) match {
    case (null, _) => null
    case (m: scala.collection.Map[_, _], st: StructType) =>
      mapToRow(m.asInstanceOf[scala.collection.Map[String, Any]], st)
    case (r: Row, _: StructType) => r
    case (s: scala.collection.Seq[_], ArrayType(et, _)) => s.map(encode(_, et))
    case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
      m.map { case (k, v) => encode(k, kt) -> encode(v, vt) }
    case (v: Number, LongType) => v.longValue()
    case (v: Number, IntegerType) => v.intValue()
    case (v: Number, DoubleType) => v.doubleValue()
    case (v: Number, FloatType) => v.floatValue()
    case (v: Number, ShortType) => v.shortValue()
    case (v: Number, ByteType) => v.byteValue()
    case (v: Number, d: DecimalType) =>
      BigDecimal(v.doubleValue()).setScale(d.scale, BigDecimal.RoundingMode.HALF_UP)
    case (v, StringType) => v.toString
    case (v, _) => v
  }

  def mapToRow(m: scala.collection.Map[String, Any], schema: StructType): Row = {
    // hot path (once per emitted record): index loop, no per-row Seq allocs
    val fields = schema.fields
    val values = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      values(i) = encode(m.getOrElse(fields(i).name, null), fields(i).dataType)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRow(values)
  }
}
