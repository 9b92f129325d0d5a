package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rules.RuleSet

/** Deterministic repair + revalidation: apply the safe, mechanical
  * normalizations a curation pipeline is allowed to make WITHOUT human
  * review, then re-run the full rule corpus on the repaired record and
  * report what changed — the "fix what is fixable, triage the rest" loop
  * the reference leaves to upstream data entry. Only repairs that are
  * pure normalizations (no information invented) are applied:
  *
  *   - case-fold the header text to the uppercase format the grammar
  *     expects (TNM-style format normalization, TNM.scala:12-18 analog);
  *   - map the known kind alias 'blob' -> 'media' (code-system alias
  *     normalization, the coding-catalog membership family's fix);
  *   - drop text carried by a media span (the status-conditional "must
  *     not" family — the text is contradictory by contract, never data);
  *   - zero the first span's offset (field-equality-vs-expected family:
  *     the expected value IS the repair).
  *
  * Every repair predicate is evaluated on the ORIGINAL spans and applied
  * simultaneously in one `transform` — repairs never cascade off each
  * other's output, so n_repairs is well-defined and the pass is
  * idempotent by construction on these rule families. Unsafe fixes
  * (inventing a missing kind, clamping an out-of-range quantity) are
  * deliberately NOT made; those docs keep their violations.
  *
  * Scale shape: one whole-stage-codegen projection per row (repair HOFs +
  * the compiled rule corpus on the repaired array) — zero shuffles, zero
  * joins; the output is a per-doc relation like `verdicts`.
  */
object Repair {

  /** The simultaneous-normalization transform over a spans array column. */
  def repairSpans(spans: Column): Column =
    transform(spans, (s, i) => {
      val kind0 = s.getField("kind")
      val text0 = s.getField("text")
      val off0 = s.getField("offset")
      val kind = when(kind0 === "blob", lit("media")).otherwise(kind0)
      val text = when(kind0 === "media" && text0.isNotNull,
          lit(null).cast("string"))
        .when(i === 0 && text0.rlike("^[a-z]{2}$"), upper(text0))
        .otherwise(text0)
      val off = when(i === 0 && off0 =!= 0, lit(0)).otherwise(off0)
      struct(kind.as("kind"), text.as("text"),
        s.getField("media_ref").as("media_ref"), off.as("offset"))
    })

  /** How many of the four repair predicates fire across the array —
    * counted on the original spans, so it equals the number of span fields
    * the transform actually rewrites. The case-fold count mirrors the
    * transform's when-chain precedence: a first span whose text the
    * media-drop branch already nulls out is never uppercased, so it must
    * not count as a case-fold repair (null-safe: a null kind is not
    * 'media'). */
  def repairCount(spans: Column): Column =
    size(filter(spans, (s, i) =>
      i === 0 && s.getField("text").rlike("^[a-z]{2}$") &&
        !(s.getField("kind") <=> "media"))) +
      size(filter(spans, s =>
        s.getField("kind") === "media" && s.getField("text").isNotNull)) +
      size(filter(spans, (s, i) =>
        i === 0 && s.getField("offset") =!= 0)) +
      size(filter(spans, s => s.getField("kind") === "blob"))

  /** Per-doc repair report: repair count + the verdict the doc earns AFTER
    * repair (columns suffixed _after). Valid docs pass through with
    * n_repairs = 0 and their original verdict. */
  def repairAndRevalidate(docs: DataFrame,
                          catalog: Map[String, String]): DataFrame = {
    val repaired = docs.select(
      col("doc_id"),
      repairCount(col("spans")).as("n_repairs"),
      repairSpans(col("spans")).as("spans"))
    val after = Validate.withViolations(repaired, catalog)
    val renamed = RuleSet.verdictCols(col("violations"))
      .zip(Seq("verdict_after", "n_fatal_after", "n_error_after",
        "n_warn_after", "n_info_after"))
      .map { case (c, n) => c.as(n) }
    after.select(col("doc_id") +: col("n_repairs") +: renamed: _*)
  }
}
