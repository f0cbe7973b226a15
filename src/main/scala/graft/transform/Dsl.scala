package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative transform spec — the engine's fast path, equivalent in
  * capability to the reference's Interpreted mode (in-JVM script, ref:
  * JythonPythonExecutor.java) but expressed as Catalyst column expressions:
  * every step compiles into the same whole-stage-codegen'd projection, so a
  * "per-record script" costs nothing per record and all of Catalyst's
  * pushdown/pruning applies through it.
  *
  * Steps mirror what reference transform scripts do to records: set/compute
  * fields, rename, drop, project to an output schema override (ref:
  * PythonEvaluator.java:99-103), filter (emit-or-not), and flat-map (0..N
  * emits, ref testSimple's double emit) via explode.
  */
object Dsl {

  sealed trait Step
  /** Add or overwrite a field with a computed expression. */
  final case class SetField(name: String, expr: Column) extends Step
  final case class RenameField(from: String, to: String) extends Step
  final case class DropFields(names: String*) extends Step
  /** Output-schema override: keep exactly these (possibly computed) columns. */
  final case class Project(cols: (String, Column)*) extends Step
  /** Emit the record only when the predicate holds. */
  final case class FilterRows(cond: Column) extends Step
  /** 0..N emits per record: one output row per element of `arr`. */
  final case class ExplodeField(name: String, arr: Column) extends Step

  final case class TransformSpec(steps: Step*) {
    def apply(df: DataFrame): DataFrame = steps.foldLeft(df) {
      case (d, SetField(n, e))    => d.withColumn(n, e)
      case (d, RenameField(f, t)) => d.withColumnRenamed(f, t)
      case (d, DropFields(ns @ _*)) => d.drop(ns: _*)
      case (d, Project(cs @ _*))  => d.select(cs.map { case (n, c) => c.as(n) }: _*)
      case (d, FilterRows(c))     => d.filter(c)
      case (d, ExplodeField(n, a)) => d.withColumn(n, explode(a))
    }
  }

  /** Field-level lineage record, what the reference registers at
    * prepareRun (ref: PythonEvaluator.java:224-256): for each output
    * field, which input fields it derives from and how. */
  sealed trait FieldLineage { def output: String }
  final case class Identity(output: String) extends FieldLineage
  final case class Renamed(output: String, from: String) extends FieldLineage
  final case class Computed(output: String, from: Seq[String]) extends FieldLineage
  final case class Dropped(output: String) extends FieldLineage

  /** Walk a spec against an input schema using Spark's own analyzer —
    * per-field lineage plus configure-time errors (references to columns
    * that don't exist at that step), the equivalent of the reference's
    * compile-at-configure check (ref: PythonEvaluator.java:99-103) and
    * prepareRun lineage registration. No data is touched: analysis runs
    * over an empty frame with the declared schema. */
  def analyze(spec: TransformSpec, input: org.apache.spark.sql.types.StructType,
              spark: org.apache.spark.sql.SparkSession)
      : (Seq[FieldLineage], Seq[String]) = {
    var df = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), input)
    val lineage = Vector.newBuilder[FieldLineage]
    val errors = Vector.newBuilder[String]
    def refsOf(e: Column): Seq[String] =
      df.select(e).queryExecution.analyzed.expressions
        .flatMap(_.references.toSeq.map(_.name)).distinct.sorted
    spec.steps.foreach { step =>
      try {
        step match {
          case SetField(n, e)     => lineage += Computed(n, refsOf(e))
          case RenameField(f, t)  => lineage += Renamed(t, f)
          case DropFields(ns @ _*) => ns.foreach(lineage += Dropped(_))
          case Project(cs @ _*) =>
            cs.foreach { case (n, e) =>
              refsOf(e) match {
                case Seq(one) if one == n => lineage += Identity(n)
                case Seq(one)             => lineage += Renamed(n, one)
                case many                 => lineage += Computed(n, many)
              }
            }
          case FilterRows(_)      => () // row-level op, no field lineage
          case ExplodeField(n, e) => lineage += Computed(n, refsOf(e))
        }
        df = TransformSpec(step).apply(df) // analyzer throws on bad refs
      } catch {
        case a: org.apache.spark.sql.AnalysisException =>
          errors += s"$step: ${a.getMessage.linesIterator.next()}"
      }
    }
    (lineage.result(), errors.result())
  }

  /** Declarative error channel: one pass is split into (valid, errors)
    * where errors carry (errorCode, errorMsg, full invalid record) — the
    * reference's emitError semantics (ref: PythonEvaluator.java:186-204)
    * as two filters over the same scan; Catalyst pushes both predicates
    * down, no driver round-trip.
    *
    * The split is exhaustive: SQL three-valued logic would otherwise drop
    * rows where `invalidWhen` evaluates to NULL (e.g. a null field inside
    * the predicate) from BOTH channels — the opposite of what a
    * quarantine primitive promises. A NULL verdict means validity could
    * not be established, so those rows route to the error channel (the
    * conservative data-quality choice): valid ⟺ invalidWhen IS FALSE.
    */
  def splitErrors(df: DataFrame, invalidWhen: Column, errorCode: Int,
                  errorMsg: Column): (DataFrame, DataFrame) = {
    val valid = df.filter(coalesce(!invalidWhen, lit(false)))
    val errors = df.filter(coalesce(invalidWhen, lit(true))).select(
      lit(errorCode).as("errorCode") +: errorMsg.as("errorMsg") +:
        df.columns.toSeq.map(col): _*)
    (valid, errors)
  }
}
