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

  /** Base coding without its optional version prefix: 'v1/m123' -> 'm123';
    * version-less refs pass through. */
  private def baseRef(r: Column): Column = substring_index(r, "/", -1)

  /** Version prefix of a ref ('v1/m123' -> 'v1'), or NULL when version-less. */
  private def refVersion(r: Column): Column =
    when(r.contains("/"), substring_index(r, "/", 1))

  /** Full row-local rule corpus. `catalog` is the broadcastable media-ref ->
    * media-kind map (reference resolver map, MTBValidators.scala:669-678);
    * at production scale the join-based variant in engine.Referential is
    * chosen instead by size (SURVEY.md §2.3 joins row). `catalogByVersion`
    * maps a catalog release name to its member refs; `latestVersion` names
    * the release that version-less (or unknown-version) codings resolve
    * against (V1 fallback, MTBValidators.scala:136-156).
    */
  def all(catalog: Map[String, String], vocab: Seq[String],
          catalogByVersion: Map[String, Seq[String]],
          latestVersion: String): Seq[Rule] = {
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
        exists(spans, s =>
          ref(s).isNotNull && !baseRef(ref(s)).isin(catalogKeys: _*))),
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
        !exists(spans, s => kind(s) <=> lit("media"))),
      // --- record-level composites (V29, MTBValidators.scala:696-730) ----
      // exactly-one over a filtered subset (`diagnoses.filter(Main) must
      // have size(1)`, :696-698): exactly one header text span at offset 0.
      // <=> keeps the filter predicate strict under NULL kinds/offsets.
      Rule("R_ONE_HEADER", "error", "spans",
        "doc must contain exactly one header text span at offset 0",
        size(filter(spans, s =>
          kind(s) <=> lit("text") && off(s) <=> lit(0))) =!= 1),
      // sorted-tail skip-first (`_.sortBy(_.issuedOn).tail validateEach
      // (recommendations orElse reason must be defined)`, :710-717): every
      // span except the chronologically first must carry text or a
      // media_ref. Comparator via when(): a plain `off(a)-off(b)` would
      // overflow under ANSI and NULL-poison the sort.
      Rule("R_TAIL_EITHER_OR", "error", "spans",
        "every non-initial span must carry text or a media_ref",
        {
          val nn = filter(spans, s => s.isNotNull)
          val sorted = array_sort(nn, (a, b) =>
            when(off(a) < off(b), -1).when(off(a) > off(b), 1).otherwise(0))
          !forall(slice(sorted, lit(2), size(nn)),
            s => text(s).isNotNull || ref(s).isNotNull)
        }),
      // cross-collection count comparison (`performanceStatus must have
      // size >= followUps.size`, :721-730): text spans must be at least as
      // numerous as media spans.
      Rule("R_TEXT_MEDIA_BALANCE", "error", "spans",
        "doc must carry at least as many text spans as media spans",
        size(filter(spans, s => kind(s) <=> lit("text"))) <
          size(filter(spans, s => kind(s) <=> lit("media")))),
      // --- either-or presence (V3, MTBValidators.scala:213-215) ----------
      // `(tnm orElse otherClassifications.filter(nonEmpty)) must be
      // (defined)`: a doc must be classified by a header text span OR by at
      // least one media span. exists() stays strict under NULLs via <=>.
      Rule("R_CLASSIFIED", "error", "spans",
        "doc must carry a header text span or a media span",
        !(exists(spans, s => kind(s) <=> lit("text") && off(s) <=> lit(0)) ||
          exists(spans, s => kind(s) <=> lit("media")))),
      // --- field equality vs expected (V13, MTBValidators.scala:369-371) --
      // `method must be (expectedMethod)`: the first span must start at the
      // expected offset 0. try_element_at: ANSI element_at throws on empty.
      Rule("R_HEADER_OFFSET_EQ", "error", "spans/offset",
        "first span must start at the expected offset 0",
        {
          val first = try_element_at(spans, lit(1)).getField("offset")
          first.isNotNull && first =!= 0
        }),
      // --- version-aware catalog membership (V1, :136-156) ---------------
      // resolve the coding's catalog release from its version prefix,
      // falling back to the latest release for version-less or unknown
      // versions, then check membership in THAT release.
      Rule("R_REF_VERSION", "error", "spans/media_ref",
        "media_ref must resolve in its version's catalog (fallback latest)",
        exists(spans, s => ref(s).isNotNull && {
          val ver = coalesce(refVersion(ref(s)), lit(latestVersion))
          val base = baseRef(ref(s))
          val latestMiss =
            !base.isin(catalogByVersion.getOrElse(latestVersion, Nil).map(lit): _*)
          catalogByVersion.toSeq.sortBy(_._1)
            .foldRight(latestMiss: Column) { case ((v, members), els) =>
              when(ver === v, !base.isin(members.map(lit): _*)).otherwise(els)
            }
        })))
  }
}
