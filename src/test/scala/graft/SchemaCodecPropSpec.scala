package graft

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.transform.SchemaCodec

/** Property: decode(encode(m)) == m for any value tree matching the
  * schema — the invariant the reference's PythonObjectsEncoder owes its
  * callers, over generated nested structures (fixed seed: reproducible). */
class SchemaCodecPropSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, Seed(42L))
      .foreach(body)

  private val schema = StructType(Seq(
    StructField("l", LongType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("arr", ArrayType(LongType)),
    StructField("m", MapType(StringType, DoubleType)),
    StructField("nested", StructType(Seq(
      StructField("x", LongType),
      StructField("ys", ArrayType(StringType)))))))

  private val genRecord: Gen[Map[String, Any]] = for {
    l <- Gen.long
    d <- Gen.chooseNum(-1e12, 1e12)
    s <- Gen.alphaNumStr
    b <- Gen.oneOf(true, false)
    arr <- Gen.listOf(Gen.long)
    keys <- Gen.listOf(Gen.alphaNumStr)
    vals <- Gen.listOfN(keys.length, Gen.chooseNum(-1e6, 1e6))
    x <- Gen.long
    ys <- Gen.listOf(Gen.alphaNumStr)
    nullNested <- Gen.oneOf(true, false)
  } yield Map(
    "l" -> l, "d" -> d, "s" -> s, "b" -> b,
    "arr" -> arr, "m" -> keys.zip(vals).toMap,
    "nested" -> (if (nullNested) null else Map("x" -> x, "ys" -> ys)))

  test("heterogeneous-union codec round-trips every branch type") {
    val u = StructType(Seq(
      StructField("id", LongType),
      SchemaCodec.unionField("u", Seq(
        LongType, StringType,
        StructType(Seq(StructField("x", LongType))),
        ArrayType(StringType)))))
    val genUnionVal: Gen[Any] = Gen.oneOf(
      Gen.long.map(v => v: Any),
      Gen.alphaNumStr.map(v => v: Any),
      Gen.long.map(x => Map("x" -> x): Any),
      Gen.listOf(Gen.alphaNumStr).map(v => v: Any),
      Gen.const(null: Any))
    forAll(Gen.zip(Gen.long, genUnionVal)) { case (id, uv) =>
      val row = SchemaCodec.mapToRow(Map("id" -> id, "u" -> uv), u)
      // on the wire: struct-of-options with at most one member set
      val wire = row.getAs[org.apache.spark.sql.Row](1)
      if (uv == null) assert(wire.toSeq.forall(_ == null))
      else assert(wire.toSeq.count(_ != null) === 1)
      val back = SchemaCodec.rowToMap(row, u)
      (uv, back("u")) match {
        case (null, got) => assert(got === null)
        case (exp: Map[_, _], got: Map[_, _]) =>
          assert(got.asInstanceOf[Map[String, Any]]("x") ===
            exp.asInstanceOf[Map[String, Any]]("x"))
        case (exp: List[_], got: Seq[_]) => assert(got === exp)
        case (exp, got) => assert(got === exp)
      }
    }
    // a value matching no branch is a script bug → loud failure
    intercept[IllegalArgumentException] {
      SchemaCodec.mapToRow(Map("id" -> 1L, "u" -> true), u)
    }
  }

  test("rowToMap . mapToRow is identity for schema-conforming values") {
    forAll(genRecord) { m =>
      val row = SchemaCodec.mapToRow(m, schema)
      val back = SchemaCodec.rowToMap(row, schema)
      assert(back("l") === m("l"))
      assert(back("d") === m("d"))
      assert(back("s") === m("s"))
      assert(back("b") === m("b"))
      assert(back("arr").asInstanceOf[Seq[Any]] === m("arr").asInstanceOf[Seq[Any]])
      assert(back("m").asInstanceOf[Map[String, Any]] ===
        m("m").asInstanceOf[Map[String, Any]])
      (m("nested"), back("nested")) match {
        case (null, got) => assert(got === null)
        case (exp: Map[_, _], got: Map[_, _]) =>
          assert(got.asInstanceOf[Map[String, Any]]("x") ===
            exp.asInstanceOf[Map[String, Any]]("x"))
          assert(got.asInstanceOf[Map[String, Any]]("ys").asInstanceOf[Seq[Any]] ===
            exp.asInstanceOf[Map[String, Any]]("ys").asInstanceOf[Seq[Any]])
        case other => fail(s"unexpected $other")
      }
    }
  }
}
