package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative per-COLUMN expectation suite — the table-level complement of
  * the per-doc rule corpus (the deequ/Great-Expectations check shape):
  * completeness, set membership, format, numeric bounds, and key
  * uniqueness, each declared once and ALL evaluated in a single wide
  * aggregate pass over the table (north_star: "per-column statistics ...
  * run as a single wide aggregate"). Output is one row per expectation:
  * (col_name, expectation, violations, allowed, pass) — exact integers,
  * so the whole report is oracle-recomputable.
  *
  * Scale shape: every expectation compiles to a conditional-sum (or exact
  * distinct-count) aggregate expression, so the table is scanned ONCE with
  * map-side partial aggregation and the result is a single driver-scale
  * row regardless of table size; the per-expectation explosion happens on
  * that one row. `Unique` adds an exact count(distinct) — Spark plans the
  * mixed distinct/non-distinct aggregate as a two-stage expand, still one
  * scan. `allowed` is an absolute violation budget (0 = hard expectation);
  * rate thresholds belong in the caller (allowed = ceil(rate * n) needs a
  * prior count, which would be a second scan).
  */
object Expectations {

  sealed trait Expectation {
    def column: String
    def name: String
    /** Aggregate expression counting violating rows (never null). */
    def violations: Column
    def allowed: Long
  }

  /** Column must be non-null. */
  final case class NotNull(column: String, allowed: Long = 0)
    extends Expectation {
    val name = "not_null"
    def violations: Column =
      sum(when(col(column).isNull, 1L).otherwise(0L))
  }

  /** Non-null values must be in the set. */
  final case class InSet(column: String, values: Seq[Any], allowed: Long = 0)
    extends Expectation {
    val name = "in_set"
    def violations: Column =
      sum(when(col(column).isNotNull && !col(column).isin(values: _*), 1L)
        .otherwise(0L))
  }

  /** Non-null values must match the (RE2/Java-portable) regex. */
  final case class Matches(column: String, regex: String, allowed: Long = 0)
    extends Expectation {
    val name = "matches"
    def violations: Column =
      sum(when(col(column).isNotNull && !col(column).rlike(regex), 1L)
        .otherwise(0L))
  }

  /** Non-null values must lie in [lo, hi]. */
  final case class Between(column: String, lo: Long, hi: Long,
                           allowed: Long = 0) extends Expectation {
    val name = "between"
    def violations: Column =
      sum(when(col(column).isNotNull &&
        (col(column) < lo || col(column) > hi), 1L).otherwise(0L))
  }

  /** Column must be a unique key: violations = rows - distinct values
    * (each extra occurrence counts once). countDistinct has SQL
    * COUNT(DISTINCT) semantics — it IGNORES NULLs — so every NULL-keyed
    * row counts as a violation, which is the right call for a key column
    * (a NULL key is not a usable unique key); add NotNull(column) to
    * report the null count separately. */
  final case class Unique(column: String, allowed: Long = 0)
    extends Expectation {
    val name = "unique"
    def violations: Column =
      count(lit(1)) - countDistinct(col(column))
  }

  /** Evaluate the whole suite in one scan. */
  def run(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    require(suite.nonEmpty, "empty expectation suite")
    val aggs = suite.zipWithIndex.map { case (e, i) =>
      coalesce(e.violations, lit(0L)).cast("long").as(s"v$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one row in, |suite| rows out: stack the counters next to their
    // expectation metadata (literals — the scan is not touched again)
    val rows = suite.zipWithIndex.map { case (e, i) =>
      struct(lit(e.column).as("col_name"), lit(e.name).as("expectation"),
        col(s"v$i").as("violations"), lit(e.allowed).as("allowed"),
        (col(s"v$i") <= e.allowed).as("pass"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
