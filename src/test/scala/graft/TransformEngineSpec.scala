package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.transform.{Dsl, Metrics, ProcessScriptTransform, SchemaCodec, ScriptTransform}
import graft.transform.Dsl._

class TransformEngineSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("transform-spec").getOrCreate()
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("ScriptTransform: multi-emit, error and alert channels in one pass") {
    val df = Seq((1, "ok"), (2, "bad"), (3, "ok")).toDF("id", "status")
    val out = StructType(Seq(StructField("id", IntegerType),
                             StructField("copy", IntegerType)))
    val result = ScriptTransform(df, out) { (r, em, _) =>
      if (r("status") == "bad") {
        em.emitError(7, "bad status", r)
        em.emitAlert(Map("severity" -> "high", "id" -> r("id").toString))
      } else {
        em.emit(Map("id" -> r("id"), "copy" -> 0))
        em.emit(Map("id" -> r("id"), "copy" -> 1)) // 0..N emits per input
      }
    }.cached()
    assert(result.out.count() === 4)
    val errs = result.errors.collect()
    assert(errs.length === 1)
    assert(errs(0).getAs[Int]("errorCode") === 7)
    assert(errs(0).getAs[Int]("id") === 2) // full invalid record preserved
    val alerts = result.alerts.collect()
    assert(alerts.length === 1)
    assert(alerts(0).getAs[Map[String, String]]("payload")("severity") === "high")
  }

  test("ScriptTransform: metrics accumulate across executors") {
    val df = (1 to 100).toDF("n").repartition(8)
    val out = StructType(Seq(StructField("n", IntegerType)))
    val metrics = Metrics(spark, "seen", "kept")
    val result = ScriptTransform(df, out, metrics = metrics) { (r, em, ctx) =>
      ctx.metrics.count("seen")
      if (r("n").asInstanceOf[Int] % 2 == 0) {
        ctx.metrics.count("kept")
        em.emit(r)
      }
    }
    assert(result.out.count() === 50)
    assert(metrics.value("seen") === 100)
    assert(metrics.value("kept") === 50)
  }

  test("ScriptTransform: runtime arguments reach the closure") {
    val df = Seq(10, 20).toDF("v")
    val out = StructType(Seq(StructField("v", IntegerType)))
    val result = ScriptTransform(df, out, arguments = Map("mult" -> "3")) {
      (r, em, ctx) =>
        em.emit(Map("v" -> r("v").asInstanceOf[Int] * ctx.arguments("mult").toInt))
    }
    assert(result.out.as[Int].collect().sorted === Array(30, 60))
  }

  test("ScriptTransform: broadcast lookup datasets resolve in the closure") {
    val df = Seq((1, "US"), (2, "FR"), (3, "XX")).toDF("id", "cc")
    val out = StructType(Seq(StructField("id", IntegerType),
                             StructField("country", StringType)))
    val result = ScriptTransform(df, out,
        lookups = Map("countries" -> Map("US" -> "United States", "FR" -> "France"))) {
      (r, em, ctx) =>
        em.emit(Map("id" -> r("id"),
          "country" -> ctx.lookup("countries", r("cc"))))
    }
    val got = result.out.orderBy("id").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)).getOrElse("null")))
    assert(got === Array((1, "United States"), (2, "France"), (3, "null")))
  }

  test("SchemaCodec round-trips nested struct/array/map and coerces numerics") {
    val schema = StructType(Seq(
      StructField("s", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType)))),
      StructField("arr", ArrayType(DoubleType)),
      StructField("m", MapType(StringType, IntegerType)),
      StructField("nul", StringType)))
    val m = Map(
      "s" -> Map("a" -> 5, "b" -> 42), // Int→Long and Int→String coercions
      "arr" -> Seq(1, 2.5),            // Int→Double coercion
      "m" -> Map("k" -> 9L),           // Long→Int coercion
      "nul" -> null)
    val row = SchemaCodec.mapToRow(m, schema)
    assert(row.getStruct(0).getLong(0) === 5L)
    assert(row.getStruct(0).getString(1) === "42")
    assert(row.getSeq[Double](1) === Seq(1.0, 2.5))
    assert(row.getMap[String, Int](2)("k") === 9)
    assert(row.isNullAt(3))
    val back = SchemaCodec.rowToMap(row, schema)
    assert(back("s").asInstanceOf[Map[String, Any]]("a") === 5L)
    assert(back("arr").asInstanceOf[Seq[Any]] === Seq(1.0, 2.5))
  }

  test("Dsl: spec steps compose and stay declarative") {
    val df = Seq((1, 4.0), (2, 9.0), (3, 1.0)).toDF("id", "v")
    val result = TransformSpec(
      SetField("v2", col("v") * 2),
      RenameField("id", "key"),
      FilterRows(col("v2") > 3),
      Project("key" -> col("key"), "v2" -> col("v2")))
      .apply(df)
    assert(result.columns.toSeq === Seq("key", "v2"))
    assert(result.orderBy("key").as[(Int, Double)].collect() ===
      Array((1, 8.0), (2, 18.0)))
    // declarative end-to-end: no serialization boundary in the plan
    assert(!result.queryExecution.executedPlan.toString.contains("Deserialize"))
  }

  test("ScriptTransform: RouteToErrors quarantines throwing records") {
    val df = Seq((1, "5"), (2, "boom"), (3, "7")).toDF("id", "payload")
    val out = StructType(Seq(StructField("id", IntegerType),
                             StructField("parsed", IntegerType)))
    val result = ScriptTransform(df, out,
        onError = ScriptTransform.RouteToErrors(599)) { (r, em, _) =>
      em.emit(Map("id" -> r("id"),
        "parsed" -> r("payload").asInstanceOf[String].toInt)) // throws on "boom"
    }.cached()
    assert(result.out.count() === 2)
    val errs = result.errors.collect()
    assert(errs.length === 1)
    assert(errs(0).getAs[Int]("errorCode") === 599)
    assert(errs(0).getAs[Int]("id") === 2)
    assert(errs(0).getAs[String]("errorMsg").contains("NumberFormatException"))
  }

  test("Dsl.analyze: field lineage and configure-time validation") {
    val spec = TransformSpec(
      SetField("charge", col("price") * (lit(1.0) - col("discount"))),
      RenameField("id", "key"),
      Project("key" -> col("key"), "charge" -> col("charge")))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("price", DoubleType), StructField("discount", DoubleType)))
    val (lineage, errors) = Dsl.analyze(spec, schema, spark)
    assert(errors.isEmpty)
    assert(lineage.contains(Dsl.Computed("charge", Seq("discount", "price"))))
    assert(lineage.contains(Dsl.Renamed("key", "id")))
    assert(lineage.contains(Dsl.Identity("key")))

    // configure-time failure: the reference compiles the script at
    // configure; Graft validates column references before any execution
    val bad = TransformSpec(SetField("x", col("nope") + 1))
    val (_, badErrors) = Dsl.analyze(bad,
      StructType(Seq(StructField("id", LongType))), spark)
    assert(badErrors.nonEmpty && badErrors.head.contains("nope"))
  }

  test("declarative and imperative paths agree on the same transform") {
    val df = Seq((1L, 10.0, 0.1), (2L, 20.0, 0.5), (3L, 5.0, 0.0))
      .toDF("id", "price", "discount")
    val declarative = TransformSpec(
      SetField("charge", col("price") * (lit(1.0) - col("discount"))),
      FilterRows(col("charge") > 4.0),
      Project("id" -> col("id"), "charge" -> col("charge")))
      .apply(df)
    val out = StructType(Seq(StructField("id", LongType),
                             StructField("charge", DoubleType)))
    val imperative = ScriptTransform(df, out) { (r, em, _) =>
      val charge = r("price").asInstanceOf[Double] *
        (1.0 - r("discount").asInstanceOf[Double])
      if (charge > 4.0)
        em.emit(Map("id" -> r("id"), "charge" -> charge))
    }.out
    assert(declarative.orderBy("id").collect().map(_.toSeq) ===
      imperative.orderBy("id").collect().map(_.toSeq))
  }

  test("Dsl.splitErrors: both channels from one scan, record preserved") {
    val df = Seq((1, 0.01), (2, 0.99)).toDF("id", "discount")
    val (valid, errors) =
      Dsl.splitErrors(df, col("discount") > 0.5, 42, lit("too big"))
    assert(valid.select("id").as[Int].collect() === Array(1))
    val e = errors.collect()(0)
    assert(e.getAs[Int]("errorCode") === 42)
    assert(e.getAs[Double]("discount") === 0.99)
  }

  test("Dsl.splitErrors is exhaustive: NULL-predicate rows quarantine, not vanish") {
    val df = Seq((1, Some(0.01)), (2, Some(0.99)), (3, None))
      .toDF("id", "discount")
    val (valid, errors) =
      Dsl.splitErrors(df, col("discount") > 0.5, 42, lit("too big"))
    // row 3's predicate is NULL (null discount): three-valued logic would
    // drop it from both channels; the quarantine contract routes it to
    // errors so every input row lands in exactly one channel
    assert(valid.select("id").as[Int].collect().sorted === Array(1))
    assert(errors.select("id").as[Int].collect().sorted === Array(2, 3))
    assert(valid.count() + errors.count() === df.count())
  }

  test("python process path: all three channels + metrics, equals the in-JVM path") {
    val df = Seq((1L, "ok", 10.0), (2L, "bad", 20.0), (3L, "ok", 30.0))
      .toDF("id", "status", "v").repartition(2)
    val out = StructType(Seq(StructField("id", LongType),
                             StructField("scaled", DoubleType)))
    // reference-API-shaped script: runs unchanged in the reference plugin
    val script =
      """def transform(record, emitter, context):
        |    context.getMetrics().count("processed")
        |    if record["status"] == "bad":
        |        context.getLogger().warn("bad record %d" % record["id"])
        |        emitter.emitError({"errorCode": 7, "errorMsg": "bad status",
        |                           "invalidRecord": record})
        |        emitter.emitAlert({"severity": "high", "id": str(record["id"])})
        |    else:
        |        m = float(context.getArguments()["mult"])
        |        emitter.emit({"id": record["id"], "scaled": record["v"] * m})
        |        emitter.emit({"id": record["id"], "scaled": record["v"] * m})
        |""".stripMargin
    val metrics = Metrics(spark, "processed")
    val py = ProcessScriptTransform.python(df, out, script,
      arguments = Map("mult" -> "2.5"), metrics = metrics).cached()
    // the same transform through the in-JVM Scala closure path
    val jvm = ScriptTransform(df, out, arguments = Map("mult" -> "2.5")) {
      (r, em, ctx) =>
        if (r("status") == "bad") {
          em.emitError(7, "bad status", r)
          em.emitAlert(Map("severity" -> "high", "id" -> r("id").toString))
        } else {
          val m = ctx.arguments("mult").toDouble
          em.emit(Map("id" -> r("id"), "scaled" -> r("v").asInstanceOf[Double] * m))
          em.emit(Map("id" -> r("id"), "scaled" -> r("v").asInstanceOf[Double] * m))
        }
    }.cached()
    assert(py.out.collect().map(_.toSeq).toSet === jvm.out.collect().map(_.toSeq).toSet)
    val pyErr = py.errors.collect()
    assert(pyErr.length === 1)
    assert(pyErr(0).getAs[Int]("errorCode") === 7)
    assert(pyErr(0).getAs[Long]("id") === 2L) // full invalid record preserved
    assert(py.alerts.collect().head
      .getAs[Map[String, String]]("payload")("severity") === "high")
    assert(metrics.value("processed") === 3)
    assert(metrics.value("log.warn") === 1)
  }

  test("python env passthrough: PYTHONPATH makes a user module importable in workers") {
    // the reference's last unported config knob: user libraries shipped
    // beside the pipeline reach the interpreter via PYTHONPATH
    // (ref: Py4jPythonExecutor.java:149, PythonEvaluator.java:117-121)
    val libDir = java.nio.file.Files.createTempDirectory("graft-pylib")
    java.nio.file.Files.write(libDir.resolve("graftuserlib.py"),
      "def triple(x):\n    return 3 * x\n".getBytes("UTF-8"))
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v").repartition(2)
    val out = StructType(Seq(StructField("id", LongType),
                             StructField("t", DoubleType)))
    val script =
      """import graftuserlib
        |def transform(record, emitter, context):
        |    emitter.emit({"id": record["id"], "t": graftuserlib.triple(record["v"])})
        |""".stripMargin
    val got = ProcessScriptTransform.python(df, out, script,
        env = Map("PYTHONPATH" -> libDir.toString))
      .out.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 30.0), (2L, 60.0)))
    // without the passthrough the same script must FAIL (proves the env
    // var — not an ambient site-packages — satisfied the import; the
    // ModuleNotFoundError traceback lands in the executor log via the
    // [graft.pyscript] stderr drain, the task error is the generic
    // worker-death)
    intercept[Exception] {
      ProcessScriptTransform.python(df, out, script).out.collect()
    }
  }

  test("python process path: FailFast surfaces script exceptions, RouteToErrors quarantines") {
    val df = Seq((1L, 2.0), (2L, 0.0), (3L, 4.0)).toDF("id", "v").repartition(1)
    val out = StructType(Seq(StructField("id", LongType),
                             StructField("inv", DoubleType)))
    val script =
      """def transform(record, emitter, context):
        |    emitter.emit({"id": record["id"], "inv": 1.0 / record["v"]})
        |""".stripMargin
    intercept[org.apache.spark.SparkException] {
      ProcessScriptTransform.python(df, out, script).out.collect()
    }
    val routed = ProcessScriptTransform.python(df, out, script,
      onError = ScriptTransform.RouteToErrors(500)).cached()
    assert(routed.out.count() === 2)
    val e = routed.errors.collect()(0)
    assert(e.getAs[Int]("errorCode") === 500)
    assert(e.getAs[String]("errorMsg").contains("ZeroDivisionError"))
    assert(e.getAs[Long]("id") === 2L)
  }

  test("python worker death mid-stream surfaces as a task error, not a hang") {
    val df = (1L to 50L).toDF("id").repartition(1)
    val out = StructType(Seq(StructField("id", LongType)))
    // worker kills itself partway through the partition
    val script =
      """import sys, os
        |def transform(record, emitter, context):
        |    if record["id"] == 25:
        |        os._exit(3)
        |    emitter.emit({"id": record["id"]})
        |""".stripMargin
    val e = intercept[org.apache.spark.SparkException] {
      ProcessScriptTransform.python(df, out, script).out.collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("python worker") || msg.contains("died"),
      s"unexpected failure text: $msg")
  }

  test("python script validation fails at configure time with the interpreter's message") {
    val bad = intercept[IllegalArgumentException] {
      ProcessScriptTransform.validate("def transform(record, emitter context):\n    pass\n")
    }
    assert(bad.getMessage.contains("syntax error"))
    val missing = intercept[IllegalArgumentException] {
      ProcessScriptTransform.validate("x = 1\n")
    }
    assert(missing.getMessage.contains("must bind transform"))
    val arity = intercept[IllegalArgumentException] {
      ProcessScriptTransform.validate("def transform(record):\n    pass\n")
    }
    assert(arity.getMessage.contains("3 positional arguments"))
    // required keyword-only params can't be satisfied by the positional
    // call the worker makes — rejected at configure time
    val kwonly = intercept[IllegalArgumentException] {
      ProcessScriptTransform.validate(
        "def transform(record, emitter, context, *, sep):\n    pass\n")
    }
    assert(kwonly.getMessage.contains("keyword-only"))
    // a valid script passes silently (including defaulted kwonly params)
    ProcessScriptTransform.validate(
      "def transform(record, emitter, context):\n    emitter.emit(record)\n")
    ProcessScriptTransform.validate(
      "def transform(record, emitter, context, *, sep=','):\n    pass\n")
  }

  test("python boundary JSON codec round-trips nested values") {
    import graft.transform.JsonCodec
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // longs arrive back as Integer from Jackson and are coerced by the
    // schema codec downstream, so the structural round-trip is asserted
    // on strings/doubles/booleans/nesting — the shapes the protocol
    // actually guarantees
    val value: Any = Map(
      "s" -> "text",
      "d" -> 3.5,
      "b" -> true,
      "nul" -> null,
      "seq" -> Seq("a", 1.25, false),
      "nested" -> Map("inner" -> Seq(Map("k" -> "v"))))
    val json = mapper.writeValueAsString(JsonCodec.toJava(value))
    val back = JsonCodec.toScala(
      mapper.readValue(json, classOf[java.util.Map[String, Object]]))
    assert(back === value)
  }

  test("python process path round-trips BINARY and datetime (bytes/datetime objects in-script)") {
    import java.sql.{Date, Timestamp}
    val in = Seq(
      (1L, Array[Byte](1, 2, 3, -128, 127), Timestamp.valueOf("2026-03-01 10:30:00.123456"),
        Date.valueOf("2026-03-01")),
      (2L, "héllo".getBytes("UTF-8"), Timestamp.valueOf("2026-08-13 23:59:59.999999"),
        Date.valueOf("2026-08-13")),
      (3L, Array.empty[Byte], Timestamp.valueOf("1969-12-31 23:59:59.5"),
        Date.valueOf("1969-12-31"))
    ).toDF("id", "payload", "ts", "day")
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType),      // echoed bytes
      StructField("doubled", BinaryType),      // script-built bytes
      StructField("n", IntegerType),           // len() proves real bytes
      StructField("ts", TimestampType),        // echoed timestamp
      StructField("plus_hour", TimestampType), // datetime arithmetic
      StructField("day", DateType),            // echoed date
      StructField("next_day", DateType)))      // date arithmetic
    val script =
      """import datetime
        |
        |def transform(record, emitter, context):
        |    p = record["payload"]
        |    assert isinstance(p, bytes), type(p).__name__
        |    t = record["ts"]
        |    assert isinstance(t, datetime.datetime), type(t).__name__
        |    d = record["day"]
        |    assert isinstance(d, datetime.date), type(d).__name__
        |    emitter.emit({"id": record["id"],
        |                  "payload": p,
        |                  "doubled": p + p,
        |                  "n": len(p),
        |                  "ts": t,
        |                  "plus_hour": t + datetime.timedelta(hours=1),
        |                  "day": d,
        |                  "next_day": d + datetime.timedelta(days=1)})
        |""".stripMargin
    val got = ProcessScriptTransform.python(in, out, script).out
      .orderBy("id").collect()
    assert(got.length === 3)
    val r1 = got(0)
    assert(r1.getAs[Array[Byte]]("payload").toSeq === Seq[Byte](1, 2, 3, -128, 127))
    assert(r1.getAs[Array[Byte]]("doubled").toSeq ===
      Seq[Byte](1, 2, 3, -128, 127, 1, 2, 3, -128, 127))
    assert(r1.getAs[Int]("n") === 5)
    assert(r1.getAs[Timestamp]("ts") === Timestamp.valueOf("2026-03-01 10:30:00.123456"))
    assert(r1.getAs[Timestamp]("plus_hour") === Timestamp.valueOf("2026-03-01 11:30:00.123456"))
    assert(r1.getAs[Date]("day") === Date.valueOf("2026-03-01"))
    assert(r1.getAs[Date]("next_day") === Date.valueOf("2026-03-02"))
    val r2 = got(1)
    assert(new String(r2.getAs[Array[Byte]]("payload"), "UTF-8") === "héllo")
    assert(r2.getAs[Int]("n") === 6) // bytes length, not str length
    assert(r2.getAs[Timestamp]("plus_hour") ===
      Timestamp.valueOf("2026-08-14 00:59:59.999999"))
    val r3 = got(2) // empty bytes + sub-second pre-epoch timestamp
    assert(r3.getAs[Array[Byte]]("payload").length === 0)
    assert(r3.getAs[Timestamp]("ts") === Timestamp.valueOf("1969-12-31 23:59:59.5"))
  }

  test("python arrow tier: negotiated on, bit-equal to the JSON protocol") {
    import java.sql.{Date, Timestamp}
    // flat scalar schema with every arrow-eligible wire family: the
    // arrow offer must be accepted (pyarrow present here — proven by
    // the worker's proto.arrow metric) and the results must match the
    // JSON-frame protocol exactly, channels included
    val in = Seq(
      (1L, "keep", 1.5f, Array[Byte](9, 8), Timestamp.valueOf("2026-01-02 03:04:05.000001"),
        Date.valueOf("2026-01-02")),
      (2L, "bad", 2.5f, Array[Byte](7), Timestamp.valueOf("1969-12-31 23:59:59.5"),
        Date.valueOf("1969-12-31")),
      (3L, "keep", -3.5f, Array.empty[Byte], Timestamp.valueOf("2026-08-17 00:00:00"),
        Date.valueOf("2026-08-17"))
    ).toDF("id", "status", "f", "payload", "ts", "day").repartition(2)
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("f2", DoubleType),
      StructField("echo", BinaryType),
      StructField("ts", TimestampType),
      StructField("day", DateType),
      StructField("tag", StringType)))
    val script =
      """def transform(record, emitter, context):
        |    context.getMetrics().count("seen")
        |    if record["status"] == "bad":
        |        emitter.emitError({"errorCode": 3, "errorMsg": "bad",
        |                           "invalidRecord": record})
        |        emitter.emitAlert({"id": str(record["id"])})
        |    else:
        |        emitter.emit({"id": record["id"], "f2": record["f"] * 2.0,
        |                      "echo": record["payload"] + record["payload"],
        |                      "ts": record["ts"], "day": record["day"],
        |                      "tag": "x%d" % record["id"]})
        |""".stripMargin
    val m = Metrics(spark, "seen", "proto.arrow")
    // the partition-size gate would route a 3-row input to JSON; pin the
    // threshold to 1 row so this spec exercises the arrow protocol itself
    spark.conf.set("graft.pyscript.arrowMinRows", "1")
    val arrow = try ProcessScriptTransform.python(in, out, script,
        metrics = m, onError = ScriptTransform.RouteToErrors(3)).cached()
      finally spark.conf.unset("graft.pyscript.arrowMinRows")
    val json = ProcessScriptTransform.python(in, out, script,
      onError = ScriptTransform.RouteToErrors(3), arrow = false).cached()
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case v => v
      }).toSet
    assert(key(arrow.out.collect()) === key(json.out.collect()))
    assert(key(arrow.errors.collect()) === key(json.errors.collect()))
    assert(arrow.alerts.count() === json.alerts.count())
    assert(m.value("seen") === 3)
    // proves the arrow protocol actually engaged (workers counted it)
    assert(m.value("proto.arrow") >= 1,
      "arrow offer was not accepted by any worker")
    // and the values themselves are right (not merely path-consistent)
    val r1 = arrow.out.orderBy("id").collect()(0)
    assert(r1.getAs[Double]("f2") === 3.0)
    assert(r1.getAs[Array[Byte]]("echo").toSeq === Seq[Byte](9, 8, 9, 8))
    assert(r1.getAs[Timestamp]("ts") ===
      Timestamp.valueOf("2026-01-02 03:04:05.000001"))
    assert(r1.getAs[Date]("day") === Date.valueOf("2026-01-02"))
    assert(r1.getAs[String]("tag") === "x1")
  }

  test("script InternalRow fast path: bit-equal to the Row-encoder path, all channels") {
    import java.sql.{Date, Timestamp}
    // the r15-deferred direct-InternalRow emitter, pinned against the
    // encoder path on a schema exercising every codec family: scalars,
    // string, binary, timestamp/date, nested struct/array/map, union,
    // enum — plus the error and alert channels under RouteToErrors
    val in = Seq(
      (1L, "ok", 2.5, Array[Byte](1, 2), Timestamp.valueOf("2026-01-02 03:04:05.000001"),
        Date.valueOf("2026-01-02"), Seq(1.0, 2.0), Map("k" -> 3.0)),
      (2L, "bad", -1.0, Array.empty[Byte], Timestamp.valueOf("1969-12-31 23:59:59.5"),
        Date.valueOf("1969-12-31"), Seq.empty[Double], Map.empty[String, Double]),
      (3L, "ok", 0.5, Array[Byte](9), Timestamp.valueOf("2026-08-17 00:00:00"),
        Date.valueOf("2026-08-17"), Seq(7.0), Map("k" -> 1.0, "j" -> 2.0))
    ).toDF("id", "status", "x", "payload", "ts", "day", "arr", "m")
      .withColumn("info", struct(col("id").as("a"), col("x").as("b")))
      .repartition(2)
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("x2", DoubleType),
      StructField("echo", BinaryType),
      StructField("ts", TimestampType),
      StructField("day", DateType),
      StructField("arr_sum", DoubleType),
      StructField("mk", DoubleType),
      StructField("a", LongType),
      SchemaCodec.enumField("flag", Seq("LOW", "HIGH")),
      SchemaCodec.unionField("u", Seq(LongType, StringType))))
    def run(): (Array[String], Array[String], Array[String]) = {
      val res = ScriptTransform(in, out,
          onError = ScriptTransform.RouteToErrors(9)) { (r, em, ctx) =>
        if (r("status") == "bad")
          throw new IllegalArgumentException("bad status")
        val info = r("info").asInstanceOf[Map[String, Any]]
        if (r("id").asInstanceOf[Long] == 3L)
          em.emitAlert(Map("why" -> "id3"))
        em.emit(Map(
          "id" -> r("id"),
          "x2" -> r("x").asInstanceOf[Double] * 2,
          "echo" -> r("payload"),
          "ts" -> r("ts"), "day" -> r("day"),
          "arr_sum" -> r("arr").asInstanceOf[Seq[Double]].sum,
          "mk" -> r("m").asInstanceOf[Map[String, Any]].getOrElse("k", -1.0),
          "a" -> info("a"),
          "flag" -> (if (r("x").asInstanceOf[Double] > 1) "HIGH" else 0),
          "u" -> (if (r("id").asInstanceOf[Long] == 1L) "one" else 2L)))
      }.cached()
      def key(rs: Array[org.apache.spark.sql.Row]) = rs.map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case v => v
      }.toString).sorted
      (key(res.out.collect()), key(res.errors.collect()), key(res.alerts.collect()))
    }
    val fast = run()
    spark.conf.set("graft.script.internalRow", "false")
    val slow = try run() finally spark.conf.unset("graft.script.internalRow")
    assert(fast._1.sameElements(slow._1), "out channel diverged")
    assert(fast._2.sameElements(slow._2), "error channel diverged")
    assert(fast._3.sameElements(slow._3), "alert channel diverged")
    assert(fast._1.length === 2 && fast._2.length === 1 && fast._3.length === 1)
  }

  test("python arrow gate: small partitions speak JSON, big ones arrow, same rows") {
    // the per-partition size gate (graft.pyscript.arrowMinRows/.arrowMinBytes):
    // a partition that ends before the threshold never offers arrow — no
    // pyarrow import for tiny inputs — while a partition past it does, and
    // the peek-buffer replay keeps the output identical either way
    val out = StructType(Seq(
      StructField("id", LongType), StructField("n", IntegerType)))
    val script =
      """def transform(record, emitter, context):
        |    emitter.emit({"id": record["id"], "n": len(record["s"])})
        |""".stripMargin
    val small = spark.range(0, 50, 1, 2).toDF("id")
      .withColumn("s", concat(lit("v"), col("id")))
    val mSmall = Metrics(spark, "proto.arrow")
    val gotSmall = ProcessScriptTransform.python(small, out, script,
      metrics = mSmall).out.collect()
    assert(gotSmall.length === 50)
    assert(mSmall.value("proto.arrow") === 0,
      "a plain-schema input must not negotiate arrow by default")
    // plain schemas opt in via arrowPlainMinRows; rows threshold cleared
    // mid-partition: arrow engages, rows identical
    spark.conf.set("graft.pyscript.arrowPlainMinRows", "10")
    val mBig = Metrics(spark, "proto.arrow")
    val gotBig = try ProcessScriptTransform.python(small, out, script,
        metrics = mBig).out.collect()
      finally spark.conf.unset("graft.pyscript.arrowPlainMinRows")
    assert(mBig.value("proto.arrow") >= 1,
      "a partition past the rows threshold must negotiate arrow")
    def key(rs: Array[org.apache.spark.sql.Row]) = rs.map(_.toSeq).toSet
    assert(key(gotBig) === key(gotSmall))
    // bytes trigger: wide payloads clear the gate before the row count
    spark.conf.set("graft.pyscript.arrowPlainMinRows", "10000")
    spark.conf.set("graft.pyscript.arrowMinBytes", "1024")
    val mBytes = Metrics(spark, "proto.arrow")
    val wide = spark.range(0, 50, 1, 2).toDF("id")
      .withColumn("s", concat(lit("w" * 200), col("id")))
    val gotBytes = try ProcessScriptTransform.python(wide, out, script,
        metrics = mBytes).out.collect()
      finally {
        spark.conf.unset("graft.pyscript.arrowMinBytes")
        spark.conf.unset("graft.pyscript.arrowPlainMinRows")
      }
    assert(mBytes.value("proto.arrow") >= 1,
      "a partition past the bytes threshold must negotiate arrow")
    assert(gotBytes.length === 50)
    // codec-heavy small input (binary out): still JSON under the default
    // 65536-row gate — the r16 break-even, not a blanket arrow-on
    val outB = StructType(Seq(
      StructField("id", LongType), StructField("b", BinaryType)))
    val scriptB =
      """def transform(record, emitter, context):
        |    emitter.emit({"id": record["id"], "b": record["s"].encode()})
        |""".stripMargin
    val mCodec = Metrics(spark, "proto.arrow")
    val gotCodec = ProcessScriptTransform.python(small, outB, scriptB,
      metrics = mCodec).out.collect()
    assert(gotCodec.length === 50)
    assert(mCodec.value("proto.arrow") === 0,
      "a 25-row codec-heavy partition must stay on JSON under the default gate")
  }

  test("python scripts may emit pre-encoded wire values (base64 str / ISO str)") {
    import java.sql.Timestamp
    // the worker's _enc passes strings through untouched, so a script
    // that already holds base64/ISO text needn't round-trip through
    // bytes/datetime objects first
    val in = Seq((1L, "x")).toDF("id", "ignore")
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType),
      StructField("ts", TimestampType)))
    val script =
      """def transform(record, emitter, context):
        |    emitter.emit({"id": record["id"],
        |                  "payload": "AQID",                    # [1,2,3]
        |                  "ts": "2026-05-04T03:02:01.000001+00:00"})
        |""".stripMargin
    val got = ProcessScriptTransform.python(in, out, script).out.collect()(0)
    assert(got.getAs[Array[Byte]]("payload").toSeq === Seq[Byte](1, 2, 3))
    assert(got.getAs[Timestamp]("ts") ===
      Timestamp.from(java.time.Instant.parse("2026-05-04T03:02:01.000001Z")))
  }

  test("python script validation never executes the module top level") {
    // under an exec-based check this would hang configuration for 600 s
    // and run the side effect on the driver host; the AST check returns
    // immediately without running it
    val t0 = System.nanoTime()
    ProcessScriptTransform.validate(
      "import time\ntime.sleep(600)\n" +
        "def transform(record, emitter, context):\n    emitter.emit(record)\n")
    assert((System.nanoTime() - t0) < 10e9, "validation must not exec the script")
    // async transform is rejected: the worker calls it synchronously
    val async = intercept[IllegalArgumentException] {
      ProcessScriptTransform.validate(
        "async def transform(record, emitter, context):\n    pass\n")
    }
    assert(async.getMessage.contains("async"))
    // non-def top-level bindings are accepted (they run fine under the
    // worker's exec): partials, aliases, imports binding `transform`
    ProcessScriptTransform.validate(
      "import functools\n" +
        "def base(tag, record, emitter, context):\n    emitter.emit(record)\n" +
        "transform = functools.partial(base, 'x')\n")
    ProcessScriptTransform.validate(
      "def impl(record, emitter, context):\n    emitter.emit(record)\n" +
        "transform = impl\n")
    ProcessScriptTransform.validate("from json import loads as transform\n")
    // unpacking assignments bind too: tuple, list, and starred targets
    // all create the name under exec, so configure-time must accept them
    ProcessScriptTransform.validate(
      "def make():\n    return (lambda r, e, c: e.emit(r)), 1\n" +
        "transform, helper = make()\n")
    ProcessScriptTransform.validate(
      "pair = (1, 2)\n[helper, transform] = pair\n")
    ProcessScriptTransform.validate(
      "seq = [1, 2, 3]\nfirst, *transform = seq\n")
    // last-binding-wins: a 1-arg def shadowed by a later assignment is
    // valid (the worker calls the assignment), so no arity error
    ProcessScriptTransform.validate(
      "import functools\n" +
        "def transform(record):\n    pass\n" +
        "def adapter(cfg, record, emitter, context):\n    emitter.emit(record)\n" +
        "transform = functools.partial(adapter, {})\n")
    // and the reverse: an assignment shadowed by a final bad def fails
    val shadowedDef = intercept[IllegalArgumentException] {
      ProcessScriptTransform.validate(
        "transform = 1\n" +
          "def transform(record):\n    pass\n")
    }
    assert(shadowedDef.getMessage.contains("3 positional arguments"))
    // trailing defaulted params are fine: callable with 3 positional args
    ProcessScriptTransform.validate(
      "def transform(record, emitter, context, debug=False):\n    pass\n")
    // as is a wider signature where the extras all default
    ProcessScriptTransform.validate(
      "def transform(record, emitter=None, context=None):\n    pass\n")
    // but a transform bound only inside a nested scope stays rejected —
    // its existence would depend on executing the module
    val nested = intercept[IllegalArgumentException] {
      ProcessScriptTransform.validate(
        "if True:\n    def transform(record, emitter, context):\n        pass\n")
    }
    assert(nested.getMessage.contains("top level"))
  }

  test("ScriptTransform: script logger reaches executor logs and counts per level") {
    val df = (1 to 20).toDF("n").repartition(4)
    val out = StructType(Seq(StructField("n", IntegerType)))
    val metrics = Metrics(spark)
    val result = ScriptTransform(df, out, metrics = metrics) { (r, em, ctx) =>
      val n = r("n").asInstanceOf[Int]
      if (n % 5 == 0) ctx.logger.warn(s"multiple of five: $n")
      ctx.logger.info(s"processing $n")
      em.emit(r)
    }
    assert(result.out.count() === 20)
    assert(metrics.value("log.info") === 20)
    assert(metrics.value("log.warn") === 4)
    assert(metrics.value("log.error") === 0)
  }
}
