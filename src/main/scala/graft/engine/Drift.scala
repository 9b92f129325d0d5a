package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift checks: PSI and KS statistic between a baseline and a
  * current population, computed from fixed-width histogram bucket counts
  * (north_star: "distribution-drift checks (PSI/KS) against a baseline stats
  * snapshot ... run as a single wide aggregate per partition").
  *
  * Scale shape: one groupBy over <=nBuckets derived keys (partial agg means
  * each task emits <=nBuckets rows), then the PSI/KS arithmetic runs on a
  * <=nBuckets-row frame — driver-negligible, shuffle-negligible. The
  * single-partition window below orders at most nBuckets rows.
  */
object Drift {

  /** `df` must expose a numeric `valueCol` and `isCurrent` (boolean Column
    * splitting current vs baseline). Laplace smoothing (+0.5 per bucket,
    * +nBuckets/2 per total) keeps PSI finite on empty buckets.
    * Returns two rows: (metric in {psi, ks}, value rounded to 6dp). */
  def psiKs(df: DataFrame, valueCol: String, isCurrent: Column,
            width: Double, nBuckets: Int): DataFrame = {
    val bucket = least(greatest(floor(col(valueCol) / width), lit(0)), lit(nBuckets - 1))
      .cast("long").as("bucket")
    val counts = df
      .select(bucket, isCurrent.cast("int").as("cur"))
      .groupBy("bucket")
      .agg(
        sum(when(col("cur") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("cur") === 1, 1L).otherwise(0L)).as("cb"))
    psiKsFromCounts(counts, nBuckets)
  }

  /** Baseline-snapshot form: persist `histogramSnapshot` of a reference
    * population to the metrics store, later compare a current population
    * against it (north_star: "PSI/KS against a baseline stats snapshot"). */
  def histogramSnapshot(df: DataFrame, valueCol: String, width: Double,
                        nBuckets: Int): DataFrame =
    Stats.histogram(df, valueCol, width, nBuckets)

  def psiKsAgainstSnapshot(current: DataFrame, valueCol: String,
                           snapshot: DataFrame, width: Double,
                           nBuckets: Int): DataFrame = {
    val cur = Stats.histogram(current, valueCol, width, nBuckets)
      .withColumnRenamed("cnt", "cb")
    val base = snapshot.withColumnRenamed("cnt", "ca")
    val counts = base.join(cur, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    psiKsFromCounts(counts, nBuckets)
  }

  /** Rule-level drift: PSI between two per-rule violation-count tables
    * (the Checkpoint metrics rows of a baseline run vs the current run) —
    * which CONSTRAINTS are firing differently, the complement of the
    * value-distribution drift above. Categories are the union of rule_ids
    * (full outer join; Laplace smoothing keeps new/vanished rules finite).
    * Input shape: (rule_id, count). */
  def rulePsi(baseline: DataFrame, current: DataFrame): DataFrame =
    rulePsiFromCounts(
      baseline.select(col("rule_id"), col("count").as("ca"))
        .join(current.select(col("rule_id"), col("count").as("cb")),
          Seq("rule_id"), "full_outer")
        .select(col("rule_id"),
          coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb")))

  /** One-pass split variant: per-rule violation counts of ONE violations
    * table (rule_id column) partitioned by `isCurrent` into baseline vs
    * current — the deterministic, oracle-checkable batch form of rulePsi
    * (one scan, one <=nrules-key aggregate; categories are all rule_ids
    * present in either half). */
  def rulePsiSplit(violations: DataFrame, isCurrent: Column): DataFrame =
    rulePsiFromCounts(
      violations
        .select(col("rule_id"), isCurrent.cast("int").as("cur"))
        .groupBy("rule_id")
        .agg(
          sum(when(col("cur") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("cur") === 1, 1L).otherwise(0L)).as("cb")))

  /** Continuous-monitoring form: PSI of each period against its
    * PREDECESSOR period, over a fixed-width value histogram — the drift
    * timeline a daily/monthly validation run appends to, answering "when
    * did the distribution move" rather than "has it moved vs one baseline".
    *
    * Scale shape: ONE groupBy on the period key with nBuckets conditional
    * sums (map-side combine: each task emits <=|periods| rows of nBuckets
    * counters — the corpus never moves), then a lag window over the
    * <=|periods|-row frame (single partition, O(periods) rows —
    * driver-negligible, same justification as psiKsFromCounts). Sparse
    * periods compare against the latest PRESENT predecessor; empty buckets
    * are dense zeros by construction of the conditional sums.
    */
  def psiTimeline(df: DataFrame, periodCol: String, valueCol: String,
                  width: Double, nBuckets: Int): DataFrame = {
    val bucket = least(greatest(floor(col(valueCol) / width), lit(0)), lit(nBuckets - 1))
      .cast("int")
    val perPeriod = df
      .select(col(periodCol).as("period"), bucket.as("b"))
      .groupBy("period")
      .agg(
        sum(when(col("b") === 0, 1L).otherwise(0L)).as("c0"),
        (1 until nBuckets).map(i =>
          sum(when(col("b") === i, 1L).otherwise(0L)).as(s"c$i")): _*)
    val w = Window.partitionBy(lit(1)).orderBy("period")
    val lagged = (0 until nBuckets).foldLeft(perPeriod) { (d, i) =>
      d.withColumn(s"p$i", lag(col(s"c$i"), 1).over(w))
    }
    val nCur = (0 until nBuckets).map(i => col(s"c$i")).reduce(_ + _)
    val nPrev = (0 until nBuckets).map(i => col(s"p$i")).reduce(_ + _)
    val half = nBuckets * 0.5
    val withTotals = lagged
      .withColumn("n_cur", nCur)
      .withColumn("n_prev", nPrev)
    val psiTerms = (0 until nBuckets).map { i =>
      val pa = (col(s"p$i") + 0.5) / (col("n_prev") + half)
      val pb = (col(s"c$i") + 0.5) / (col("n_cur") + half)
      (pa - pb) * log(pa / pb)
    }.reduce(_ + _)
    withTotals
      .where(col("n_prev").isNotNull) // the first period has no predecessor
      .select(col("period"), col("n_prev"), col("n_cur"),
        round(psiTerms, 6).as("psi"))
  }

  private def rulePsiFromCounts(counts: DataFrame): DataFrame = {
    val whole = Window.partitionBy(lit(1))
    val n = counts.withColumn("nrules", count(lit(1)).over(whole))
      .withColumn("na", sum("ca").over(whole))
      .withColumn("nb", sum("cb").over(whole))
      .withColumn("pa", (col("ca") + 0.5) / (col("na") + col("nrules") * 0.5))
      .withColumn("pb", (col("cb") + 0.5) / (col("nb") + col("nrules") * 0.5))
    n.agg(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))).as("v"))
      .select(lit("rule_psi").as("metric"), round(col("v"), 6).as("value"))
  }

  /** PSI + KS from per-bucket (ca=baseline, cb=current) counts. */
  private def psiKsFromCounts(counts: DataFrame, nBuckets: Int): DataFrame = {
    // `counts` is already the bucketized aggregate: nBuckets rows TOTAL,
    // independent of corpus size. The single-partition windows below (Spark
    // logs a WindowExec warning) therefore move O(nBuckets) rows — the
    // corpus-scale work happened in the upstream map-side-combined count.
    val whole = Window.partitionBy(lit(1))
    val ordered = Window.partitionBy(lit(1)).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = counts
      .withColumn("na", sum("ca").over(whole))
      .withColumn("nb", sum("cb").over(whole))
      .withColumn("pa", (col("ca") + 0.5) / (col("na") + nBuckets * 0.5))
      .withColumn("pb", (col("cb") + 0.5) / (col("nb") + nBuckets * 0.5))
      .withColumn("cuma", sum("ca").over(ordered) / col("na"))
      .withColumn("cumb", sum("cb").over(ordered) / col("nb"))
    val psi = e.agg(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))).as("v"))
      .select(lit("psi").as("metric"), round(col("v"), 6).as("value"))
    val ks = e.agg(max(abs(col("cuma") - col("cumb"))).as("v"))
      .select(lit("ks").as("metric"), round(col("v"), 6).as("value"))
    psi.unionAll(ks)
  }
}
