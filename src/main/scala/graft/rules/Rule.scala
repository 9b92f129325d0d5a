package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One declarative constraint: fires a structured violation
  * (rule_id, severity, path, message) when `violatedWhen` is true for a row.
  *
  * The Spark re-expression of the reference's
  * `Validator[Issue, T] = T => ValidatedNel[Issue, T]` (MTBValidators.scala
  * signature convention): instead of an applicative fold over one JVM object,
  * every rule is a Catalyst predicate Column evaluated for all rows at once
  * under whole-stage codegen. Severity model (info<warning<error<fatal) per
  * SURVEY.md §2.4.
  */
final case class Rule(
    id: String,
    severity: String,
    path: String,
    message: String,
    violatedWhen: Column) {
  require(graft.model.Schemas.severities.contains(severity), s"bad severity: $severity")

  /** NULL when not violated, else the violation struct. */
  def asStruct: Column =
    when(violatedWhen, struct(
      lit(id).as("rule_id"),
      lit(severity).as("severity"),
      lit(path).as("path"),
      lit(message).as("message")))
}

/** Compiles a rule corpus into ONE row-local violations array column —
  * the whole constraint suite evaluates in a single narrow projection with
  * no shuffle and no explode (issues "accumulate, never fail-fast", like the
  * reference's ValidatedNel accumulation, MTBValidators.scala:6-9).
  */
object RuleSet {

  /** array<struct<rule_id,severity,path,message>> of fired rules. */
  def violationsArray(rules: Seq[Rule]): Column =
    filter(array(rules.map(_.asStruct): _*), v => v.isNotNull)

  private def countSev(v: Column, sev: String): Column =
    size(filter(v, x => x.getField("severity") === sev))

  /** Verdict columns from a violations array column, mirroring the
    * reference's triage (fatal => rejected, cf. FatalIssuesDetected at
    * Tests.scala:47-54; SURVEY.md §2.4 verdict CASE). */
  def verdictCols(v: Column): Seq[Column] = {
    val nFatal = countSev(v, "fatal")
    val nError = countSev(v, "error")
    val nWarn = countSev(v, "warning")
    val nInfo = countSev(v, "info")
    Seq(
      when(nFatal > 0, lit("rejected"))
        .when(nError > 0, lit("invalid"))
        .when(nWarn > 0 || nInfo > 0, lit("acceptable"))
        .otherwise(lit("valid")).as("verdict"),
      nFatal.as("n_fatal"),
      nError.as("n_error"),
      nWarn.as("n_warn"),
      nInfo.as("n_info"))
  }
}
