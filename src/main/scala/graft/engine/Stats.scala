package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column statistics as ONE wide aggregate pass (north_star: "a single
  * wide aggregate per partition") — null counts, exact/approx distinct,
  * min/max — then unpivoted to one row per column. The set-at-a-time analog
  * of the per-record presence/size checks the reference accumulates.
  *
  * `exactDistinct = true` uses count(DISTINCT) (oracle-comparable);
  * at 10^12-doc scale use `exactDistinct = false` -> approx_count_distinct
  * (HLL, constant memory, single pass, no expand).
  */
object Stats {

  def columnStats(df: DataFrame, cols: Seq[String],
                  exactDistinct: Boolean = true): DataFrame = {
    val aggs = count(lit(1)).as("n_total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr(
      "n_total",
      s"stack(${cols.size}, $stackArgs) as (col_name, n_nonnull, n_distinct, min_v, max_v)")
      .select(
        col("col_name"),
        col("n_total"),
        (col("n_total") - col("n_nonnull")).as("n_null"),
        col("n_distinct"),
        col("min_v"),
        col("max_v"))
  }

  /** Mergeable HLL sketches per column, one wide aggregate pass — the
    * persistable distinct-count path for the metrics table at 10^12 docs
    * (north_star: "distinct-count via HLL sketches"). Sketches union across
    * partitions/buckets/runs via hll_union; estimates via
    * hll_sketch_estimate. Output: one row, a binary sketch per column. */
  def hllSketches(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => hll_sketch_agg(col(c)).as(s"${c}__hll"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** (col_name, n_distinct_approx) from a sketches row. */
  def hllEstimates(sketches: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', hll_sketch_estimate(`${c}__hll`)").mkString(", ")
    sketches.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (col_name, n_distinct_approx)")
  }

  /** Union two sketch rows (e.g. metrics of two buckets/runs) column-wise. */
  def hllMerge(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val u = a.unionAll(b)
    val aggs = cols.map(c => hll_union_agg(col(s"${c}__hll")).as(s"${c}__hll"))
    u.agg(aggs.head, aggs.tail: _*)
  }

  /** Fixed-width value histogram (clamped top bucket) — groupBy on a derived
    * bucket key; partial aggregation makes this one shuffle of <=nBuckets
    * rows per task regardless of input size. */
  def histogram(df: DataFrame, valueCol: String, width: Double,
                nBuckets: Int): DataFrame =
    df.groupBy(
        least(greatest(floor(col(valueCol) / width), lit(0)), lit(nBuckets - 1))
          .cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
}
