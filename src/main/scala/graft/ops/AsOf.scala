package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — the standard time-series operator Spark lacks
  * natively (ref: every native engine ships one; DuckDB's ASOF JOIN is the
  * oracle twin). For each left row, attach the single right row with the
  * greatest right timestamp <= the left timestamp within the same key.
  *
  * Scale shape: NOT a per-left-row lookup or an inequality theta-join
  * (both O(left x right) in Spark). Both sides are union-tagged into one
  * relation, shuffled ONCE on the key, sorted by (time, side, tiebreak)
  * within each key partition, and swept with a running
  * `last(right_payload, ignoreNulls)` window — an O(n log n) sort plus one
  * linear pass, the same merge-sweep a native engine's as-of executes,
  * parallel across keys. Right rows sort before left rows at equal
  * timestamps, giving inclusive (<=) semantics; `rightTiebreak` makes the
  * winner among equal right timestamps deterministic. Hot-key skew is
  * bounded by per-key row counts (an entity's own history), the natural
  * partition grain of time-series data.
  */
object AsOf {

  /** Left rows keep all their columns; the matched right row's columns
    * arrive nested as a struct column `asofCol` (NULL when no right row
    * precedes the left row — left-join semantics; the name is a parameter
    * and the call FAILS FAST if the left schema already uses it). Among
    * right rows with EQUAL timestamps the max-`rightTiebreak` row wins,
    * deterministically — engines whose as-of leaves equal-timestamp picks
    * unspecified (e.g. DuckDB ASOF) agree only after reducing the right
    * side to one row per (key, ts), which is how the oracle is phrased.
    *
    * NULL contract (matches SQL comparison semantics, e.g. DuckDB ASOF): a
    * right row with a NULL key or NULL timestamp can never be "the latest
    * prior row" — such rows are dropped before the sweep (unfiltered they
    * would sort nulls-first and match every left row with no genuine
    * predecessor). Left rows with a NULL key or timestamp are KEPT and get
    * a NULL match: a NULL left timestamp sorts before every right row of
    * its key and a NULL left key shares its partition only with other
    * null-key left rows, so the running sweep sees no right row either way. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightTiebreak: Option[String] = None,
               asofCol: String = "asof"): DataFrame = {
    require(!left.columns.contains(asofCol),
      s"left relation already has a column named '$asofCol'; pass a " +
        "different asofCol")
    val rStruct = struct(right.columns.map(col): _*)
    val rType = right.schema
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.schema
    val tb = rightTiebreak.map(col).getOrElse(lit(0L))
    val r = right
      .where(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key).as("__k"), col(rightTs).as("__t"),
      lit(0).as("__side"), tb.as("__tb"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    val l = left.select(col(key).as("__k"), col(leftTs).as("__t"),
      lit(1).as("__side"), lit(0L).cast(r.schema("__tb").dataType).as("__tb"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    // running frame: Spark evaluates last(...ignoreNulls) over a growing
    // frame as one linear sweep per key partition (no per-row rescans)
    val w = Window.partitionBy("__k").orderBy("__t", "__side", "__tb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionAll(l)
      .withColumn(asofCol, last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*"), col(asofCol))
  }

  /** Attribution query over the events table: each purchase matched to the
    * same user's latest prior (or simultaneous) click, with the gap in
    * whole seconds — the canonical as-of use. */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    asOfJoin(purchases, clicks, key = "user_id", leftTs = "purchase_ts",
      rightTs = "click_ts", rightTiebreak = Some("click_id"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("asof.click_id").as("click_id"), col("asof.click_ts").as("click_ts"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("asof.click_ts")))
          .as("gap_s"))
  }
}
