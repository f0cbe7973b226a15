// Custom Catalyst expressions live under org.apache.spark.sql so they can
// use the private[sql] expression-building surface (ExpressionUtils,
// AbstractDataType) — the same placement Spark's own extension libraries
// use. Engine code accesses them only through the stable facade below.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native vector expressions (SURVEY.md §3: custom Catalyst Expression
  * over UDF over anything else).
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * CodegenFallback: each row pays interpreted-lambda overhead, and the
  * enclosing operator falls out of whole-stage codegen — benchmarked ~150x
  * slower than DuckDB's native list_dot_product on the all-pairs cosine
  * sweep. [[DotProduct]] generates a tight primitive double loop instead,
  * keeping the whole pipeline inside codegen. Semantics are the same
  * strict sequential left fold, so results are bit-identical to the HOF
  * formulation and to DuckDB's list_dot_product.
  */
object VectorExprs {
  /** dot(a, b) over array<double> as a codegen'd primitive loop. Arrays
    * must be null-free (embedding columns are); lengths are clamped to the
    * shorter side. */
  def dotp(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Bridge to the private[sql] Column↔Expression conversion, for engine
    * code outside the sql package (e.g. lineage analysis over Columns). */
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
