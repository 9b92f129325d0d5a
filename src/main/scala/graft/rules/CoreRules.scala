package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The constraint corpus over the interleaved docs table. Each rule class
  * re-expresses one family from the reference's MTBValidators.scala
  * (cited per rule), evaluated span-sequence-preserving via higher-order
  * functions — never exploded in the hot path.
  */
object CoreRules {

  private val spans = col("spans")
  private def kind(s: Column) = s.getField("kind")
  private def text(s: Column) = s.getField("text")
  private def ref(s: Column) = s.getField("media_ref")
  private def off(s: Column) = s.getField("offset")

  /** Offsets strictly increasing (temporal/ordering family — the analog of
    * period/date ordering checks, MTBValidators.scala:245-247,312-317).
    * Pairwise check over indices; guarded so `sequence` never runs
    * descending on short arrays. */
  def offsetsOutOfOrder: Column =
    when(size(spans) > 1,
      exists(
        transform(sequence(lit(1), size(spans) - 1),
          i => off(element_at(spans, i + 1)) <= off(element_at(spans, i))),
        b => b))
      .otherwise(lit(false))

  /** Full row-local rule corpus. `catalog` is the broadcastable media-ref ->
    * media-kind map (reference resolver map, MTBValidators.scala:669-678);
    * at production scale the join-based variant in engine.Referential is
    * chosen instead by size (SURVEY.md §2.3 joins row).
    */
  def all(catalog: Map[String, String], vocab: Seq[String]): Seq[Rule] = {
    // isin over >10 values becomes Catalyst InSet — an O(1) hash-set probe
    // under codegen. (A typedLit(Map) lookup is a LINEAR scan: Catalyst
    // literal maps are ArrayBasedMapData — 1000x slower per span here.)
    val catalogKeys = catalog.keys.toSeq.map(lit)
    Seq(
      // presence family (`must be (defined)`, MTBValidators.scala:242-244)
      Rule("R_KIND_PRESENT", "error", "spans/kind",
        "span kind must be present",
        exists(spans, s => kind(s).isNull)),
      Rule("R_TEXT_PRESENT", "error", "spans/text",
        "text span must carry text",
        exists(spans, s => kind(s) === "text" && text(s).isNull)),
      // value-set membership (`must be (in ...)`, coding catalogs V1/V2,
      // MTBValidators.scala:126-156,523)
      Rule("R_KIND_VOCAB", "error", "spans/kind",
        "span kind must be in vocabulary",
        exists(spans, s => kind(s).isNotNull && !kind(s).isin(vocab.map(lit): _*))),
      // referential integrity, fatal on unresolved (supporting-findings
      // resolver, MTBValidators.scala:563-567)
      Rule("R_MEDIA_REF_RESOLVES", "fatal", "spans/media_ref",
        "span media_ref must resolve in media catalog",
        exists(spans, s => ref(s).isNotNull && !ref(s).isin(catalogKeys: _*))),
      // format/regex family (TNM grammar, TNM.scala:12-18; HGVS format V20)
      Rule("R_TEXT_FORMAT", "error", "spans/text",
        "header text span must match ^[A-Z]{2}$",
        exists(spans, s =>
          kind(s) === "text" && off(s) === 0 && text(s).isNotNull &&
            !text(s).rlike("^[A-Z]{2}$"))),
      // numeric range family (ClosedInterval checks, MTBValidators.scala:363,442-444).
      // ANSI-safe: a bare cast("int") THROWS under Spark 4 ANSI mode for
      // digit-only text beyond Int range (e.g. '99999999999'), crashing the
      // query instead of flagging the doc. The when() guard keeps the cast
      // unreachable above 18 digits (<= 18 digits always fits a long), and
      // any digits-only value longer than that is out-of-range by
      // definition — matching SpanViolations.numericValue overflow
      // semantics exactly.
      Rule("R_QTY_RANGE", "error", "spans/text",
        "numeric text span must be in [1,50]",
        exists(spans, s =>
          kind(s) === "text" && text(s).isNotNull && text(s).rlike("^[0-9]+$") &&
            (length(text(s)) > 18 ||
              !when(length(text(s)) <= 18, text(s).cast("bigint"))
                .between(1, 50)))),
      // conditional / cross-field family (status-conditional V9/V28,
      // MTBValidators.scala:279-320,639-644)
      Rule("R_MEDIA_NO_TEXT", "warning", "spans/text",
        "media span must not carry text",
        exists(spans, s => kind(s) === "media" && text(s).isNotNull)),
      // ordering family
      Rule("R_OFFSET_ORDER", "error", "spans/offset",
        "span offsets must be strictly increasing",
        offsetsOutOfOrder),
      // cardinality family (`must have size(...)`, MTBValidators.scala:696-698,721-723)
      Rule("R_SPAN_COUNT", "error", "spans",
        "doc must contain between 1 and 8 spans",
        !size(spans).between(1, 8)),
      // info-severity enrichment hint (Severity.Info pattern, MTBValidators.scala:544,547).
      // eqNullSafe: a NULL kind must count as "not media", not poison the
      // exists() fold to NULL (SQL three-valued logic).
      Rule("R_HAS_MEDIA", "info", "spans",
        "doc carries no media span",
        !exists(spans, s => kind(s) <=> lit("media"))))
  }
}
