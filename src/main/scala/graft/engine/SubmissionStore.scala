package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-period persistence of quarterly submission reports — the analog of
  * the reference's MVH submission-metadata repository, which persists each
  * reporting period's submission report into a dedicated store
  * (/root/reference/impl/src/main/scala/de/dnpm/dip/mtb/mvh/impl/RepositoryImpl.scala:15-45,
  * wired through the service in MTBMVHServiceImpl.scala:23-36).
  *
  * Spark-first shape: the report table is partitioned by period (yr, qtr)
  * and persisted with DYNAMIC partition overwrite — re-running a period
  * replaces exactly that period's rows (idempotent retries, late-data
  * refreshes) and never touches other periods. Storage goes through the
  * TableIO seam, so an Iceberg `overwritePartitions` drops in unchanged.
  */
object SubmissionStore {

  def submissionsPath(outDir: String): String = s"$outDir/submissions"

  /** Persist a quarterly report (columns yr, qtr, ...) for all periods it
    * contains; each contained period is replaced atomically-per-partition.
    * `runId` is recorded on every row for lineage (which run produced the
    * period's current report). */
  def persist(reports: DataFrame, outDir: String, runId: String): Unit =
    TableIO.overwritePartitions(
      reports.withColumn("run_id", lit(runId))
        // one file per period partition (a report is a handful of rows; an
        // unrepartitioned write emits tasks x periods tiny files)
        .repartition(col("yr"), col("qtr")),
      submissionsPath(outDir), Seq("yr", "qtr"))

  /** All persisted periods. */
  def read(spark: SparkSession, outDir: String): DataFrame =
    TableIO.read(spark, submissionsPath(outDir))
}
