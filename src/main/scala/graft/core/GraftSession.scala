package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, IsNull, Literal, Or}
import org.apache.spark.sql.graft.{DotInt8, DotProduct, Int8Scale, NearestCell, QuantizeInt8}
import org.apache.spark.sql.types.LongType

/** Session factory with the engine's standard configuration.
  *
  * Settings chosen for correctness parity with the DuckDB oracle (UTC,
  * nanos-as-long) and for scale (AQE on, skew-join handling, shuffle
  * partition count sized to cores locally — on a real cluster AQE
  * coalescing makes the initial number a ceiling, not a constant).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // engine extensions: native expressions available from SQL too
      .withExtensions { ext =>
        def fn(name: String, cls: Class[_])(build: Seq[Expression] => Expression): Unit =
          ext.injectFunction((FunctionIdentifier(name),
            new ExpressionInfo(cls.getName, name), build))
        fn("graft_dot", classOf[DotProduct])(c => DotProduct(c.head, c(1)))
        // the raw kernel is non-nullable by contract (callers in the
        // operator layer filter nulls to keep the codegen win); the SQL
        // surface guards it with an If that constant-folds away for
        // non-nullable inputs, so ad-hoc SQL over nullable columns gets
        // NULL instead of an NPE
        fn("graft_nearest_cell", classOf[NearestCell])(c =>
          If(Or(Or(IsNull(c.head), IsNull(c(1))), IsNull(c(2))),
            Literal.create(null, LongType),
            NearestCell(c.head, c(1), c(2))))
        fn("graft_quantize_int8", classOf[QuantizeInt8])(c => QuantizeInt8(c.head))
        fn("graft_int8_scale", classOf[Int8Scale])(c => Int8Scale(c.head))
        fn("graft_dot_int8", classOf[DotInt8])(c => DotInt8(c.head, c(1)))
      }
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime bloom-filter join pruning: at cluster scale a selective
      // dim filter prunes the fact scan before the shuffle
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed (bucketed) tables land in tmp, not the caller's cwd
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /** Apply engine confs to an existing session (e.g. one the driver built). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    } catch { case _: Throwable => () }
    spark
  }
}
