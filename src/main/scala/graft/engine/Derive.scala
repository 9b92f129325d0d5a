package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-group derivations mirroring the reference's non-predicate operators:
  * argmax-per-group (V30 lastResponsesByTherapy, MTBValidators.scala:686-692),
  * coalesce censoring cascades (V5/V6, :159-208), conditional set-folds
  * (V33 sequenceTypes, MTBMVHServiceImpl.scala:51-76) and the quarterly
  * report aggregation (V34, :78-84).
  */
object Derive {

  private def events(spark: SparkSession, sfDir: String): DataFrame =
    graft.data.Tables.read(spark, sfDir, "events")

  /** Latest event per user — deterministic argmax on (ts, event_id) via
    * max_by, NOT a row_number window: the aggregate partially combines
    * map-side, so the shuffle carries one row per (partition, user) while
    * the window formulation would ship EVERY event to its user's reducer
    * and sort there. Tie-break by event_id (unique) keeps it exact. */
  def latestEventPerUser(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy("user_id")
      .agg(max_by(
        struct(col("event_id"), col("event_type"), col("ts"), col("value")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id"), col("m.event_type"),
        col("m.ts"), col("m.value"))

  /** Censoring cascade per order — the V5/V6 dateOfProgressionOrCensoring
    * shape (MTBValidators.scala:176-208), all four reference levels:
    *   1. latest progression-marked response   -> latest 'R'-returned ship date
    *   2. status-gated: IF the order is Finished, its period end orElse
    *      recording date                       -> when(status='F',
    *                                              coalesce(last 'F' ship, order date))
    *   3. date of death                        -> latest ship date overall
    *   4. censoring: recording date            -> order date
    * Level 2 mirrors the reference's nested `period.endOption.getOrElse
    * (recordedOn)` INSIDE the status condition: a Finished order resolves at
    * level 2 and never falls through to level 3.
    * Aggregate lineitem first (map-side combine), then join orders. */
  def censorDatePerOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val li = graft.data.Tables.read(spark, sfDir, "lineitem")
    val orders = graft.data.Tables.read(spark, sfDir, "orders")
    val agg = li.groupBy("l_orderkey").agg(
      max(when(col("l_returnflag") === "R", col("l_shipdate"))).as("last_returned"),
      max(when(col("l_linestatus") === "F", col("l_shipdate"))).as("last_f_shipped"),
      max(col("l_shipdate")).as("last_shipped"))
    orders
      .join(agg, orders("o_orderkey") === agg("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        coalesce(
          col("last_returned"),
          when(col("o_orderstatus") === "F",
            coalesce(col("last_f_shipped"), col("o_orderdate"))),
          col("last_shipped"),
          col("o_orderdate")).as("censor_ts"))
  }

  /** Conditional set-fold per user: which event categories the user has,
    * folded into a canonical comma-joined set (V33's {DNA}/{RNA} fold). */
  def eventTypeSetPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val flags = types.map(t =>
      max(when(col("event_type") === t, 1).otherwise(0)).as(s"has_$t"))
    events(spark, sfDir)
      .groupBy("user_id")
      .agg(flags.head, flags.tail: _*)
      .select(
        col("user_id"),
        concat_ws(",", types.map(t =>
          when(col(s"has_$t") === 1, lit(t))): _*).as("type_set"))
  }

  /** Quarterly report aggregation (V34): counts + value totals per
    * (year, quarter, event_type). Values are money with 2 decimals, so the
    * total is summed as EXACT integer cents — a float sum is summation-
    * order dependent and at sf0.1 one group landed on a .5 rounding
    * boundary, flipping the rounded total by 1 between engines. Integer
    * arithmetic is associative: identical result under any partitioning.
    * (Values are non-negative, so +50 DIV 100 is round-half-up.) */
  def quarterlyReport(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .groupBy(
        year(col("ts")).as("yr"),
        quarter(col("ts")).as("qtr"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("yr"), col("qtr"), col("event_type"), col("n_events"),
        expr("(cents + 50) DIV 100").as("value_sum"))
}
