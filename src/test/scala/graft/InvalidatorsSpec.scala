package graft

import org.apache.spark.sql.functions._
import graft.engine.Validate
import graft.model.{Doc, Span}

/** Typed-Dataset mirror of the reference's test idiom
  * (Invalidators.scala:22-111 + Tests.scala:45-56): start from a VALID
  * record, apply one invalidator function per invariant, and assert the
  * exact structured violation (rule_id, severity, path) and the verdict —
  * the analog of asserting `Left(FatalIssuesDetected(report))`.
  */
object Invalidators {
  private def span(kind: String, text: String = null, ref: String = null,
                   offset: Int = 0) =
    Span(Option(kind), Option(text), Option(ref), offset)

  /** A fully valid doc against the rule corpus + catalog {m1}. */
  val valid: Doc = Doc("d-1", Seq(
    span("text", text = "AF", offset = 0),
    span("media", ref = "m1", offset = 10),
    span("text", text = "17", offset = 20)))

  val nullKind: Doc => Doc =
    d => d.copy(spans = d.spans.updated(0, d.spans(0).copy(kind = None)))
  val unknownKind: Doc => Doc =
    d => d.copy(spans = d.spans.updated(1, d.spans(1).copy(kind = Some("blob"))))
  val danglingRef: Doc => Doc =
    d => d.copy(spans = d.spans.updated(1, d.spans(1).copy(media_ref = Some("x9"))))
  val unorderedOffsets: Doc => Doc =
    d => d.copy(spans = d.spans.updated(2, d.spans(2).copy(offset = 5)))
  val badFormat: Doc => Doc =
    d => d.copy(spans = d.spans.updated(0, d.spans(0).copy(text = Some("af"))))
  val outOfRange: Doc => Doc =
    d => d.copy(spans = d.spans.updated(2, d.spans(2).copy(text = Some("999"))))
  val textOnMedia: Doc => Doc =
    d => d.copy(spans = d.spans.updated(1, d.spans(1).copy(text = Some("leak"))))
  val emptySpans: Doc => Doc = d => d.copy(spans = Seq.empty)
  val missingText: Doc => Doc =
    d => d.copy(spans = d.spans.updated(0, d.spans(0).copy(text = None)))
  // record-level composites (V29) + either-or (V3) + equality (V13) + V1
  val secondHeader: Doc => Doc =
    d => d.copy(spans = d.spans :+ span("text", text = "AB", offset = 0))
  val bareTailSpan: Doc => Doc =
    d => d.copy(spans = d.spans.updated(2, d.spans(2).copy(text = None)))
  val mediaHeavy: Doc => Doc =
    d => d.copy(spans = d.spans ++ Seq(
      span("media", ref = "m1", offset = 30), span("media", ref = "m1", offset = 40)))
  val unclassified: Doc => Doc =
    d => d.copy(spans = Seq(
      d.spans(0).copy(kind = None),
      d.spans(1).copy(kind = Some("blob")),
      d.spans(2)))
  val shiftedHeader: Doc => Doc =
    d => d.copy(spans = d.spans.updated(0, d.spans(0).copy(offset = 7)))
  val oldVersionRef: Doc => Doc =
    d => d.copy(spans = d.spans.updated(1, d.spans(1).copy(media_ref = Some("v1/m1"))))
}

class InvalidatorsSpec extends SparkSpec {
  import spark.implicits._

  private val catalog = Map("m1" -> "image")

  private def check(break: Doc => Doc, ruleId: String, severity: String,
                    path: String, verdict: String): Unit = {
    val docs = Seq(break(Invalidators.valid)).toDS().toDF()
    val v = Validate.violations(docs, catalog)
      .select("rule_id", "severity", "path").as[(String, String, String)]
      .collect().toSet
    assert(v.contains((ruleId, severity, path)),
      s"expected ($ruleId,$severity,$path) in $v")
    val verdictGot = Validate.verdicts(docs, catalog)
      .select("verdict").as[String].head()
    assert(verdictGot == verdict, s"verdict $verdictGot != $verdict")
  }

  test("the valid doc produces zero violations and verdict 'valid'") {
    val docs = Seq(Invalidators.valid).toDS().toDF()
    assert(Validate.violations(docs, catalog).isEmpty)
    assert(Validate.verdicts(docs, catalog).select("verdict").as[String].head() == "valid")
  }

  test("null kind => presence error") {
    check(Invalidators.nullKind, "R_KIND_PRESENT", "error", "spans/kind", "invalid")
  }
  test("unknown kind => vocabulary error") {
    check(Invalidators.unknownKind, "R_KIND_VOCAB", "error", "spans/kind", "invalid")
  }
  test("dangling media_ref => FATAL, doc rejected") {
    check(Invalidators.danglingRef, "R_MEDIA_REF_RESOLVES", "fatal",
      "spans/media_ref", "rejected")
  }
  test("unordered offsets => ordering error") {
    check(Invalidators.unorderedOffsets, "R_OFFSET_ORDER", "error",
      "spans/offset", "invalid")
  }
  test("lowercased header => format error") {
    check(Invalidators.badFormat, "R_TEXT_FORMAT", "error", "spans/text", "invalid")
  }
  test("numeric span out of [1,50] => range error") {
    check(Invalidators.outOfRange, "R_QTY_RANGE", "error", "spans/text", "invalid")
  }
  test("text on a media span => warning only, doc still acceptable") {
    check(Invalidators.textOnMedia, "R_MEDIA_NO_TEXT", "warning",
      "spans/text", "acceptable")
  }
  test("empty spans => cardinality error") {
    check(Invalidators.emptySpans, "R_SPAN_COUNT", "error", "spans", "invalid")
  }
  test("text span without text => presence error") {
    check(Invalidators.missingText, "R_TEXT_PRESENT", "error", "spans/text", "invalid")
  }
  test("second header span => exactly-one error (V29 exactly-one-Main)") {
    check(Invalidators.secondHeader, "R_ONE_HEADER", "error", "spans", "invalid")
  }
  test("non-initial span with neither text nor ref => sorted-tail error (V29)") {
    check(Invalidators.bareTailSpan, "R_TAIL_EITHER_OR", "error", "spans", "invalid")
  }
  test("more media than text spans => balance error (V29 count comparison)") {
    check(Invalidators.mediaHeavy, "R_TEXT_MEDIA_BALANCE", "error", "spans", "invalid")
  }
  test("neither header nor media span => either-or error (V3)") {
    check(Invalidators.unclassified, "R_CLASSIFIED", "error", "spans", "invalid")
  }
  test("first span off the expected offset => equality error (V13)") {
    check(Invalidators.shiftedHeader, "R_HEADER_OFFSET_EQ", "error",
      "spans/offset", "invalid")
  }
  test("code valid in latest but absent from its declared version => V1 error") {
    // 'm1' resolves (base ref in catalog: NO fatal), but the coding pins
    // catalog release v1, which does not contain it -> membership error only
    val docs = Seq(Invalidators.oldVersionRef(Invalidators.valid)).toDS().toDF()
    val v = Validate.violations(docs, catalog)
      .select("rule_id").as[String].collect().toSet
    assert(v.contains("R_REF_VERSION") && !v.contains("R_MEDIA_REF_RESOLVES"), v.toString)
  }
  test("version-less and known-version codings resolve against their catalogs") {
    // version-less 'm1' falls back to latest (v2, contains everything) and
    // an explicit 'v2/m1' also passes: zero violations either way
    val explicitV2 = Invalidators.valid.copy(spans = Invalidators.valid.spans
      .updated(1, Invalidators.valid.spans(1).copy(media_ref = Some("v2/m1"))))
    val docs = Seq(Invalidators.valid, explicitV2).toDS().toDF()
    assert(Validate.violations(docs, catalog).isEmpty)
  }
}

/** Regex-corpus test in the reference's shape (Tests.scala:66-113: a
  * literal corpus of real codes must fully match the format grammar). */
class FormatCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val headerPattern = "^[A-Z]{2}$".r.pattern
  private val validCorpus =
    for (a <- Seq("A", "N", "R"); b <- Seq("F", "O")) yield a + b
  private val invalidCorpus =
    Seq("af", "A", "AFX", "A1", " AF", "AF ", "", "aF", "Af", "4F", "A-")

  test("every code in the valid corpus matches; every invalid one fails") {
    validCorpus.foreach(c => assert(headerPattern.matcher(c).matches(), c))
    invalidCorpus.foreach(c => assert(!headerPattern.matcher(c).matches(), c))
  }

  test("the engine agrees with the corpus through the rule column") {
    val docs = (validCorpus ++ invalidCorpus).zipWithIndex.map { case (c, i) =>
      graft.model.Doc(s"c-$i", Seq(graft.model.Span(Some("text"), Some(c), None, 0)))
    }
    val flagged = graft.engine.Validate
      .violations(docs.toDS().toDF(), Map.empty)
      .where(col("rule_id") === "R_TEXT_FORMAT")
      .select("doc_id").as[String].collect().toSet
    val expected = (validCorpus ++ invalidCorpus).zipWithIndex
      .collect { case (c, i) if !headerPattern.matcher(c).matches() => s"c-$i" }.toSet
    assert(flagged == expected)
  }
}
