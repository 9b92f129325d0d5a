package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fact-table reader that restores scan parallelism.
  *
  * The sandbox parquet files are written as a SINGLE row group, so Spark
  * cannot byte-range-split them: every downstream map-side operator would
  * run as one task no matter how many cores the session has (measured:
  * identical wall-clock at local[8] and local[32]). A production table at
  * 10^12 docs is thousands of files/row groups and splits for free; this
  * helper emulates that by fanning the scan out to the session's default
  * parallelism. Dimension reads (media catalog, broadcast sides) stay
  * unsplit — repartitioning a broadcast input is pure overhead.
  */
object Tables {

  /** Per-table fan-out key columns: the (unique-ish) primary key of each
    * sandbox table. The fan-out hashes ONLY these — hashing every column
    * would pull the whole row into the repartition expression and defeat
    * column pruning at the scan (ReadSchema would list every column). */
  private val fanOutKeys: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "orders" -> Seq("o_orderkey"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "customer" -> Seq("c_custkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"))

  /** Reads a fact table, fanning out ONLY when the scan is starved for
    * parallelism (fewer scan partitions than cores). A production table
    * already splits into >= parallelism partitions, so this path adds no
    * Exchange there — the repartition must never sit unconditionally on the
    * production path (it would full-shuffle 100 TB before any work).
    *
    * The fan-out key is a DETERMINISTIC hash of the table's key columns,
    * not round-robin: `repartition(n)` pays a LOCAL SORT of its input first
    * (spark.sql.execution.sortBeforeRepartition, on since SPARK-23207, so
    * retried tasks reproduce their row-to-partition assignment) — and here
    * that sort runs inside the single row-group-bound scan task, i.e. on
    * the serial choke point the fan-out exists to relieve (measured: the
    * sort cost 0.5-1.0 s of single-task time per fact query at sf0.1).
    * xxhash64(key) is a retry-safe pure function of the row (no sort
    * needed, uniform spread at effectively-unique keys, and the key
    * columns are narrow so scan column pruning is unaffected); every
    * registered operator is partitioning-invariant by contract, so results
    * are unchanged. */
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) {
      import org.apache.spark.sql.functions.{col, xxhash64}
      val keys = fanOutKeys.getOrElse(name, df.columns.toSeq)
      df.repartition(target, xxhash64(keys.map(col): _*))
    } else df
  }

  /** Materializes a table hash-bucketed (and sorted) by `key`, so every
    * subsequent equi-join or aggregation on `key` between tables bucketed
    * with the SAME bucket count is co-located: Spark reads matching buckets
    * pairwise and adds NO shuffle (asserted in EngineSpec). This is the
    * storage-level answer for the repeated doc_id joins a 10^12-doc
    * validation pipeline makes (verdicts x violations x lineage); at that
    * scale the same declaration is Iceberg's `bucket(N, key)` partition
    * transform. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int = 32): Unit = {
    val spark = df.sparkSession
    // idempotent rebuild: also clear an orphaned location a previous
    // session's in-memory catalog left behind (overwrite alone refuses it)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }
}
