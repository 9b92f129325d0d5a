package graft

import org.apache.spark.sql.functions._
import graft.data.DocGen
import graft.engine.Validate
import graft.model.{Doc, Span}

/** Targeted-invalidation round-trip tests — the Spark analog of the
  * reference's Invalidators pattern (Invalidators.scala:22-111 + Tests
  * .scala:45-56): break one invariant, assert the exact structured
  * violation and the verdict triage.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val catalog = DocGen.mediaCatalogMap(spark, sf)
  private lazy val docs = DocGen.docs(spark, sf).cache()
  private lazy val violations = Validate.violations(docs, catalog).cache()

  /** First doc_id whose orderkey matches `hit` and none of `miss` —
    * orderkeys are sparse, so injected docs are selected dynamically. */
  private def pickDoc(hit: Int, miss: Int*): String = {
    val ok = split(col("doc_id"), "-").getItem(0).cast("long")
    val cond = miss.foldLeft(ok % hit === 0)((c, m) => c && ok % m =!= 0)
    docs.where(cond).select("doc_id").as[String].head()
  }

  private def rulesFor(docId: String): Set[String] =
    violations.where(col("doc_id") === docId)
      .select("rule_id").as[String].collect().toSet

  test("presence break (ok%89=0) fires R_KIND_PRESENT") {
    assert(rulesFor(pickDoc(89, 71)).contains("R_KIND_PRESENT"))
  }
  test("vocabulary break (ok%83=0) fires R_KIND_VOCAB and R_HAS_MEDIA info") {
    val r = rulesFor(pickDoc(83, 71))
    assert(r.contains("R_KIND_VOCAB") && r.contains("R_HAS_MEDIA"))
  }
  test("dangling ref (ok%79=0) fires fatal R_MEDIA_REF_RESOLVES") {
    val v = violations.where(col("doc_id") === pickDoc(79, 71))
      .where(col("rule_id") === "R_MEDIA_REF_RESOLVES")
      .select("severity").as[String].collect()
    // duplicate doc_ids are validated per physical row -> one row per copy
    assert(v.nonEmpty && v.toSet == Set("fatal"))
  }
  test("ordering break (ok%97=0) fires R_OFFSET_ORDER") {
    assert(rulesFor(pickDoc(97, 71)).contains("R_OFFSET_ORDER"))
  }
  test("format break (ok%73=0) fires R_TEXT_FORMAT") {
    assert(rulesFor(pickDoc(73, 71, 89, 43)).contains("R_TEXT_FORMAT"))
  }
  test("empty spans (ok%71=0) fires exactly cardinality + info + composites") {
    assert(rulesFor(pickDoc(71)) ==
      Set("R_SPAN_COUNT", "R_HAS_MEDIA", "R_ONE_HEADER", "R_CLASSIFIED"))
  }
  test("cross-field break (ok%67=0) fires warning R_MEDIA_NO_TEXT") {
    assert(rulesFor(pickDoc(67, 71, 83)).contains("R_MEDIA_NO_TEXT"))
  }
  test("range break (ok%61=0) fires R_QTY_RANGE") {
    assert(rulesFor(pickDoc(61, 71, 53)).contains("R_QTY_RANGE"))
  }
  test("second header (ok%59=0) fires R_ONE_HEADER (V29 exactly-one)") {
    val r = rulesFor(pickDoc(59, 71, 89, 43))
    assert(r.contains("R_ONE_HEADER") && r.contains("R_OFFSET_ORDER"))
  }
  test("bare tail span (ok%53=0) fires R_TAIL_EITHER_OR + R_TEXT_PRESENT (V29)") {
    val r = rulesFor(pickDoc(53, 71, 43))
    assert(r.contains("R_TAIL_EITHER_OR") && r.contains("R_TEXT_PRESENT"))
  }
  test("media-heavy doc (ok%47=0) fires R_TEXT_MEDIA_BALANCE (V29 counts)") {
    assert(rulesFor(pickDoc(47, 71, 83, 89)).contains("R_TEXT_MEDIA_BALANCE"))
  }
  test("shifted header (ok%43=0) fires R_HEADER_OFFSET_EQ (V13 equality)") {
    val r = rulesFor(pickDoc(43, 71))
    assert(r.contains("R_HEADER_OFFSET_EQ") && r.contains("R_ONE_HEADER"))
  }
  test("versioned refs (ok%41=0, odd residue) fire R_REF_VERSION (V1)") {
    val fired = violations.where(col("rule_id") === "R_REF_VERSION")
      .select("doc_id").as[String].collect()
    assert(fired.nonEmpty)
    val ok = fired.map(_.split("-")(0).toLong)
    assert(ok.forall(k => k % 41 == 0 || k % 79 == 0),
      "version-membership misses must come from the %41 injection or dangling %79 refs")
  }

  private val allInjections =
    Seq(41, 43, 47, 53, 59, 61, 67, 71, 73, 79, 83, 89, 97)

  test("clean doc is valid; verdict triage matches severity model") {
    val cleanId = pickDoc(1, allInjections: _*)
    val v = Validate.verdicts(docs, catalog).cache()
    val clean = v.where(col("doc_id") === cleanId).collect().head
    assert(clean.getAs[String]("verdict") == "valid")
    assert(clean.getAs[Int]("n_error") == 0 && clean.getAs[Int]("n_fatal") == 0)
    val fatal = v.where(col("doc_id") === pickDoc(79, 71)).collect().head
    assert(fatal.getAs[String]("verdict") == "rejected")
    val warn = v.where(col("doc_id") === pickDoc(67, allInjections.filter(_ != 67): _*))
      .collect().head
    assert(warn.getAs[String]("verdict") == "acceptable")
    v.unpersist()
  }

  test("span-sequence equality: typed round-trip preserves (kind,text,media_ref,order)") {
    val cleanId = pickDoc(1, allInjections: _*)
    val d = docs.where(col("doc_id") === cleanId).as[Doc].collect().head
    // reconstructed via the HOF fingerprint must equal a fingerprint built
    // from the typed collected rows — exact order-sensitive equality
    val fp = Validate.spanFingerprint(docs.where(col("doc_id") === cleanId))
      .select("span_fp").as[String].collect().head
    val expected = d.spans.map(s =>
      s"${s.kind.getOrElse("~")}:${s.text.getOrElse("~")}:${s.media_ref.getOrElse("~")}:${s.offset}|").mkString
    assert(fp == expected)
    assert(d.spans.map(_.offset) == d.spans.map(_.offset).sorted)
    assert(d.spans.map(_.kind) == Seq(Some("text"), Some("media"), Some("text")))
  }

  test("hot path adds no shuffles beyond the scan fan-out") {
    val qe = Validate.verdicts(DocGen.docs(spark, sf), catalog).queryExecution
    val plan = qe.executedPlan.toString
    // the only exchange allowed is Tables.read's round-robin scan fan-out
    // (sandbox stand-in for multi-file scans); rule evaluation itself —
    // everything above the scan — must introduce NO shuffle at all
    val aboveScan = plan.split("Scan parquet|InMemoryTableScan").head
    assert(!aboveScan.contains("Exchange"),
      s"rule evaluation must add no shuffle:\n$plan")
    val formatted = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("Scan parquet"), "columnar parquet scan expected")
    // only the 6 needed lineitem columns are read (nested-field pruning)
    assert(!formatted.contains("l_extendedprice"), "unused columns must be pruned")
  }
}
