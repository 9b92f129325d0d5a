package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-uniqueness check via salted two-phase aggregation — defuses hot-key
  * skew at 10^12-doc scale (north_rule requirement; SURVEY.md §2.3
  * aggregations row).
  *
  * The salt must NOT be a function of the key (hash(key) % buckets places
  * every row of a hot key on the same phase-1 reducer that a plain
  * groupBy(key) would — a no-op). It is the input partition id instead: a
  * hot key's rows are spread across its input partitions, so phase 1 fans
  * them out over up to `saltBuckets` reducers, and phase 2 re-aggregates the
  * per-slice counts — exact for any algebraic aggregate (count/sum merge
  * associatively regardless of how the slices were cut).
  *
  * Honest scope note: for count/sum the hash aggregate's map-side partial
  * combine already bounds per-key shuffle volume to one row per mapper, so
  * salting is belt-and-braces here; it becomes load-bearing for holistic
  * aggregates (collect_list / exact distinct per key) where no map-side
  * combine exists.
  */
object Uniqueness {

  def duplicateKeys(df: DataFrame, key: String, saltBuckets: Int = 64): DataFrame = {
    val salt: Column = pmod(spark_partition_id(), lit(saltBuckets)).as("salt")
    df.select(col(key), salt)
      .groupBy(col("salt"), col(key)).agg(count(lit(1)).as("cnt_slice")) // phase 1: hot key spread over <= saltBuckets reducers
      .groupBy(col(key)).agg(sum(col("cnt_slice")).as("cnt"))            // phase 2: tiny re-agg
      .where(col("cnt") > 1)
  }
}
