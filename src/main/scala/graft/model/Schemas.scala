package graft.model

import org.apache.spark.sql.types._

/** Typed row models + canonical schemas for the interleaved docs table.
  *
  * The engine validates documents shaped per the production contract:
  * `doc_id:string, spans:array<struct<kind,text,media_ref,offset>>` — the
  * Spark analog of the reference's nested `MTBPatientRecord` aggregate
  * (destructured at /root/reference/impl/src/main/scala/de/dnpm/dip/mtb/
  * validation/impl/MTBValidators.scala:650-692).
  */
final case class Span(
    kind: Option[String],
    text: Option[String],
    media_ref: Option[String],
    offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

/** Structured violation row — mirrors the reference's
  * `Issue(severity, path, message)` (severities imported at
  * MTBValidators.scala:49-55) plus a stable rule_id so tests assert
  * structurally rather than on prose.
  */
final case class Violation(
    doc_id: String,
    rule_id: String,
    severity: String,
    path: String,
    message: String)

object Schemas {
  val spanStruct: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("text", StringType),
    StructField("media_ref", StringType),
    StructField("offset", IntegerType)))

  val spanArray: ArrayType = ArrayType(spanStruct)

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", spanArray)))

  val violationStruct: StructType = StructType(Seq(
    StructField("rule_id", StringType),
    StructField("severity", StringType),
    StructField("path", StringType),
    StructField("message", StringType)))

  /** Severity ranks: Info < Warning < Error < Fatal
    * (reference 4-level model, SURVEY.md §2.4). */
  val severities: Seq[String] = Seq("info", "warning", "error", "fatal")
}
