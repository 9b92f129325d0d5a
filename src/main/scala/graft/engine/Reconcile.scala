package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.data.Tables

/** Cross-table consistency checks — the validation families the reference
  * expresses BETWEEN records rather than within one: a header's stored
  * aggregate must reconcile with the sum of its detail lines, and a
  * functional dependency (one key, one value) must hold across the table.
  * These complete the referential family (`Referential.dangling` checks
  * existence; these check CONSISTENCY of what exists) — the
  * diagnosis-therapy-variant cross-record integrity class of
  * `/root/reference/impl/src/main/scala/de/dnpm/dip/mtb/validation/impl/MTBValidators.scala:650-743`,
  * generalized to aggregate agreement.
  *
  * Scale shape: both inputs are fact tables, so the detail side is
  * pre-aggregated per key BEFORE the join (map-side partial combine bounds
  * shuffle volume to one row per key per mapper) and the join runs on two
  * <=|header| keyed sides — never a raw fact-to-fact join. Money is compared
  * in EXACT integer cents (float sums are summation-order dependent; integer
  * addition is associative under any partitioning — same hardening as
  * Derive.quarterlyReport).
  */
object Reconcile {

  /** Header/detail total reconciliation: per order, `o_totalprice` vs the
    * integer-cents sum of its lineitems' `l_extendedprice`. Emits ONE
    * violation row per inconsistent order, classified:
    *   - R_ORPHAN_LINES (fatal): detail lines whose order header is missing
    *     (the reverse-referential analog, here with the computed evidence);
    *   - R_NO_LINES (warning): an order header with zero detail lines;
    *   - R_TOTAL_MISMATCH (error): both present, stored != computed cents.
    * Consistent orders emit nothing. All output columns are non-null
    * (sentinels -1 / 0) so the violation row is a self-contained record.
    */
  def orderTotals(spark: SparkSession, sfDir: String): DataFrame =
    orderTotalsFrom(
      Tables.read(spark, sfDir, "orders")
        .select(col("o_orderkey").as("order_key"),
          round(col("o_totalprice") * 100).cast("long").as("stored_cents")),
      Tables.read(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("order_key"),
          col("l_extendedprice").as("line_value")))

  /** Core reconciliation over pre-projected frames:
    * header(order_key, stored_cents) x detail(order_key, line_value). */
  def orderTotalsFrom(header: DataFrame, detailLines: DataFrame): DataFrame = {
    val detail = detailLines
      .groupBy(col("order_key"))
      .agg(
        sum(round(col("line_value") * 100).cast("long")).as("computed_cents"),
        count(lit(1)).as("n_lines"))
    // SHUFFLE_HASH over the default sort-merge (same rationale as
    // verdictDiff): both sides are <=|header| fixed-width keyed rows, so
    // the per-partition hash build is bounded and cheaper than two full
    // sorts; full-outer shuffled-hash is supported (build side tracks
    // matched rows)
    val joined = header.join(detail.hint("SHUFFLE_HASH"),
      Seq("order_key"), "full_outer")
    val rule = when(col("stored_cents").isNull, lit("R_ORPHAN_LINES"))
      .when(col("n_lines").isNull, lit("R_NO_LINES"))
      .when(col("stored_cents") =!= col("computed_cents"), lit("R_TOTAL_MISMATCH"))
    val severity = when(col("stored_cents").isNull, lit("fatal"))
      .when(col("n_lines").isNull, lit("warning"))
      .otherwise(lit("error"))
    joined
      .withColumn("rule_id", rule)
      .where(col("rule_id").isNotNull)
      .select(
        col("order_key"),
        coalesce(col("stored_cents"), lit(-1L)).as("stored_cents"),
        coalesce(col("computed_cents"), lit(-1L)).as("computed_cents"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        when(col("stored_cents").isNotNull && col("computed_cents").isNotNull,
          col("stored_cents") - col("computed_cents")).otherwise(lit(0L))
          .as("diff_cents"),
        col("rule_id"),
        severity.as("severity"))
  }

  /** Functional-dependency violation scan: groups of `keys` under which the
    * (pre-projected, string-typed) dependent column `dep` takes more than
    * one distinct value. Emits the group key, how many distinct values and
    * rows it covers, and the min/max dependent values as evidence.
    *
    * `count(DISTINCT dep)` is holistic, but Catalyst plans it as the
    * standard two-level expand + partial-agg rewrite: the first level is
    * keyed by (keys, dep) — high cardinality, well distributed — and only
    * the per-key distinct COUNTS shuffle to the key reducers, so a hot key
    * never funnels its raw rows onto one task.
    */
  def fdViolations(df: DataFrame, keys: Seq[String], dep: String,
                   ruleId: String, severity: String = "error"): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count_distinct(col(dep)).as("n_values"),
        count(lit(1)).as("n_rows"),
        min(col(dep)).as("dep_min"),
        max(col(dep)).as("dep_max"))
      .where(col("n_values") > 1)
      .withColumn("rule_id", lit(ruleId))
      .withColumn("severity", lit(severity))

  /** Cross-record temporal precondition: every `target` event of an entity
    * must be preceded — in the (ts, id) total order, strictly earlier rows —
    * by at least one `required` event of the SAME entity (the reference's
    * "therapy requires a prior diagnosis" ordering family, expressed over an
    * event log). Emits the violating target events.
    *
    * Scale shape: one shuffle on the entity key, then a RUNNING count frame
    * (unboundedPreceding .. -1) — Spark evaluates cumulative frames
    * incrementally in O(rows), never re-scanning the frame per row. A
    * pathologically hot entity serializes its own window; at 10^9-event
    * entities the production move is sessionize first (streaming/Sessionize)
    * and run the precondition per session.
    */
  def requiresPriorEvent(events: DataFrame, entityCol: String, typeCol: String,
                         tsCol: String, idCol: String,
                         target: String, required: String,
                         ruleId: String, severity: String = "error"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("prior_required",
        count(when(col(typeCol) === required, 1)).over(w))
      .where(col(typeCol) === target && col("prior_required") === 0)
      .select(
        col(entityCol), col(idCol),
        // parquet ts is TIMESTAMP_NTZ; the session tz is pinned UTC, so the
        // cast matches DuckDB's epoch_us over the naive timestamp
        unix_micros(col(tsCol).cast("timestamp")).as("ts_micros"),
        lit(ruleId).as("rule_id"),
        lit(severity).as("severity"))
  }

  /** Bounded per-rule violation exemplars: for every (rule_id, severity),
    * the total violation count, the distinct-document count, and the k
    * lexicographically-smallest violating doc_ids as a comma-joined example
    * list — the triage artifact a validation report attaches to each rule so
    * an operator can inspect concrete failures without scanning the
    * violations table.
    *
    * Scale shape: rule_id has ~nrules values, i.e. every rule is a hot key
    * BY DESIGN. The doc-level dedup aggregates on (rule, severity, doc) —
    * high-cardinality, well-spread — and the final <=nrules-key aggregate
    * uses the size-bounded mergeable collector (BoundedCollect.strings), so
    * each mapper ships at most k doc_ids per rule and the reducer buffer is
    * capped at 2k elements: a rule violated by 10^11 documents costs the
    * same memory as one violated by ten.
    */
  /** Verdict transition matrix between two validation runs over the same
    * doc population — the regression gate an engine, rule-corpus, or
    * repair upgrade runs before promoting: per (verdict_before,
    * verdict_after) doc counts plus <=k exemplar doc_ids per cell to
    * chase. ONE doc_id equi-join (the only corpus-scale shuffle; both
    * sides are per-doc relations) feeding a <=25-key aggregate with the
    * bounded exemplar collector (every transition cell is a hot key by
    * design — same rationale as [[violationExamples]]). The join is FULL
    * OUTER with absent sides surfacing as verdict 'absent': a doc_id
    * dropped or introduced between runs is itself a reported regression,
    * not a silently-ignored row.
    *
    * Both sides accept either a plain validation run (`verdict` column —
    * two Validate.verdicts outputs, the engine-upgrade gate) or a repair
    * report (`verdict_after` — Repair.repairAndRevalidate). */
  def verdictDiff(before: DataFrame, after: DataFrame, k: Int = 5): DataFrame = {
    def verdictOf(df: DataFrame): Column =
      if (df.columns.contains("verdict")) col("verdict")
      else col("verdict_after")
    // SHUFFLE_HASH, not the default sort-merge (guide-of-record §3.1: pick
    // the strategy deliberately): both sides are fixed-width narrow rows
    // (doc_id + one enum string), so a post-shuffle partition's hash table
    // is bounded by the AQE advisory partition size and the build is
    // cheaper than sort-merge's TWO full sorts of per-doc relations.
    // Spark supports full-outer shuffled-hash since 3.1 (build side tracks
    // matched rows). With heavy skew or fatter rows sort-merge's graceful
    // spill would win — per-doc verdict relations are uniform by
    // construction (doc_id is effectively unique per side).
    before.select(col("doc_id"), verdictOf(before).as("verdict_before"))
      .join(after.select(col("doc_id"), verdictOf(after).as("verdict_after"))
          .hint("SHUFFLE_HASH"),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("verdict_before"), lit("absent")).as("verdict_before"),
        coalesce(col("verdict_after"), lit("absent")).as("verdict_after"))
      .groupBy(col("verdict_before"), col("verdict_after"))
      .agg(count(lit(1)).as("n_docs"),
        graft.functions.BoundedCollect.strings(k)(col("doc_id")).as("ex"))
      .select(col("verdict_before"), col("verdict_after"), col("n_docs"),
        array_join(col("ex"), ",").as("examples"))
  }

  def violationExamples(violations: DataFrame, k: Int): DataFrame = {
    val perDoc = violations
      .groupBy(col("rule_id"), col("severity"), col("doc_id"))
      .agg(count(lit(1)).as("n_in_doc"))
    perDoc
      .groupBy(col("rule_id"), col("severity"))
      .agg(
        sum(col("n_in_doc")).as("n_violations"),
        count(lit(1)).as("n_docs"),
        graft.functions.BoundedCollect.strings(k)(col("doc_id")).as("ex"))
      .select(
        col("rule_id"), col("severity"), col("n_violations"), col("n_docs"),
        array_join(col("ex"), ",").as("examples"))
  }
}
