// Lives under org.apache.spark.sql to reach the private[sql]
// internalCreateDataFrame — the same placement as DeferredDF.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{DataFrame, SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/** Build a DataFrame directly over an RDD[InternalRow] — the boundary
  * [[graft.transform.ScriptTransform]]'s InternalRow fast path needs:
  * a task that already produced catalyst rows must not round-trip them
  * through external Rows and the row encoder just to re-enter SQL. */
object InternalRowDF {
  def apply(spark: org.apache.spark.sql.SparkSession, schema: StructType,
            rdd: RDD[InternalRow]): DataFrame =
    spark.asInstanceOf[ClassicSession].internalCreateDataFrame(rdd, schema)
}
