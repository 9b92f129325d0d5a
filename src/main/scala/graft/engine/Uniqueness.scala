package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-uniqueness check via salted two-phase aggregation — defuses hot-key
  * skew at 10^12-doc scale (north_rule requirement; SURVEY.md §2.3
  * aggregations row). A straight `groupBy(doc_id)` would hash-shuffle every
  * row to one reducer per key; with a power-law key distribution one
  * straggler partition dominates the stage. Phase 1 pre-aggregates on
  * (salt, key) so each reducer sees at most `saltBuckets` slices of a hot
  * key; phase 2 re-aggregates the (much smaller) per-slice counts.
  *
  * Correctness under salting: the salt is a pure function of the key
  * (hash(key) % buckets), so all physical duplicates of a key land in the
  * SAME salt bucket — a duplicate can never hide across buckets. (Salting by
  * random number would break exactness; see SURVEY.md §7.3 hard-parts (d).)
  */
object Uniqueness {

  def duplicateKeys(df: DataFrame, key: String, saltBuckets: Int = 64): DataFrame = {
    val salt: Column = pmod(xxhash64(col(key)), lit(saltBuckets)).as("salt")
    df.select(col(key), salt)
      .groupBy(col("salt"), col(key)).agg(count(lit(1)).as("cnt_slice")) // phase 1: partial, map-side combine
      .groupBy(col(key)).agg(sum(col("cnt_slice")).as("cnt"))            // phase 2: tiny re-agg
      .where(col("cnt") > 1)
  }
}
