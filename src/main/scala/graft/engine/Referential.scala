package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity check between span media_refs and the media
  * catalog, join-strategy chosen BY SIZE (north_star requirement): broadcast
  * hash anti-join for small catalogs, sort-merge anti-join for large ones —
  * the set-at-a-time analog of the reference's per-record resolver lookups
  * (MTBValidators.scala:563-567,669-678).
  */
object Referential {

  /** Catalog row-count threshold below which we broadcast. At 100 TB the
    * catalog row count is known from table metadata — callers should pass
    * `catalogRows` (an upper bound is enough for the comparison) rather
    * than let the fallback `dim.count()` run an extra job. */
  val broadcastMaxRows = 1000000L

  /** All (doc_id, media_ref) pairs whose media_ref does not resolve.
    * Explodes only the media_ref field (narrowest possible generator input)
    * and anti-joins against the catalog. */
  def dangling(docs: DataFrame, catalog: DataFrame,
               catalogRows: Option[Long] = None): DataFrame = {
    val refs = docs
      .select(col("doc_id"),
        explode_outer(filter(col("spans"), s => s.getField("media_ref").isNotNull)).as("s"))
      .where(col("s").isNotNull)
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
      // resolve on the base coding: an explicit catalog-version prefix
      // ('v1/m123') addresses a release, not a different entity — version
      // membership is R_REF_VERSION's job, resolution is ours
      .withColumn("base_ref", substring_index(col("media_ref"), "/", -1))
    val dim = catalog.select(col("media_ref").as("base_ref"))
    val n = catalogRows.getOrElse(dim.count())
    val right = if (n <= broadcastMaxRows) broadcast(dim) else dim
    refs.join(right, Seq("base_ref"), "left_anti")
      .select(col("doc_id"), col("media_ref"))
  }
}
