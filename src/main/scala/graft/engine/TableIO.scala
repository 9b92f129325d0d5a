package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** One storage backend: how tables are read/written at a path. */
trait TableProvider {
  def read(spark: SparkSession, path: String): DataFrame
  def write(df: DataFrame, path: String): Unit
  def append(df: DataFrame, path: String): Unit

  /** Replace ONLY the partitions present in `df` (dynamic partition
    * overwrite) — the idempotent per-period/per-bucket persistence shape. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit

  /** Replace the WHOLE table, partitioned — the full-corpus SINK shape,
    * where partitions left over from a previous differently-configured
    * write (other nShards, other corpus) must NOT survive; dynamic
    * overwrite would keep any partition the new write does not touch.
    * Iceberg: `writeTo(...).replace()`. */
  def replaceTable(df: DataFrame, path: String,
                   partitionCols: Seq[String]): Unit

  /** Whether a table exists at `path` — part of the provider contract so
    * engine existence probes (checkpoint lineage, watermark tables) go
    * through the SAME seam as reads: an Iceberg provider answers from its
    * catalog, not from a filesystem path the engine has no business
    * assuming. */
  def exists(spark: SparkSession, path: String): Boolean
}

/** Default backend: local/HDFS Parquet. In production the Iceberg provider
  * implements the same four calls with `spark.table` /
  * `writeTo(...).overwritePartitions` — engine code is unchanged. */
object ParquetTableProvider extends TableProvider {
  override def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
  override def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
  override def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)
  override def overwritePartitions(df: DataFrame, path: String,
                                   partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  override def replaceTable(df: DataFrame, path: String,
                            partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  override def exists(spark: SparkSession, path: String): Boolean = {
    // Hadoop FileSystem API, not java.io: the path may be HDFS/S3
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}

/** Storage seam with a PLUGGABLE provider, mirroring the reference's
  * ServiceLoader SPI where a registered (test) implementation overrides the
  * default repository
  * (/root/reference/impl/src/main/scala/de/dnpm/dip/mtb/validation/impl/MTBValidationRepository.scala:19-47:
  * a runtime-context implementation wins, else the default file-system repo).
  * The provider is selected per session by the Spark conf
  * `spark.graft.tableio.provider` (default "parquet"); alternatives are
  * registered by name — a test registers an in-memory recorder, a
  * production deploy registers "iceberg" without touching engine code.
  */
object TableIO {
  val ProviderConf = "spark.graft.tableio.provider"

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, TableProvider]()
  registry.put("parquet", ParquetTableProvider)

  def register(name: String, provider: TableProvider): Unit =
    registry.put(name, provider)

  private def provider(spark: SparkSession): TableProvider = {
    val name = spark.conf.get(ProviderConf, "parquet")
    val p = registry.get(name)
    require(p != null,
      s"no TableIO provider registered under '$name' " +
        s"(registered: ${registry.keySet()})")
    p
  }

  def read(spark: SparkSession, path: String): DataFrame =
    provider(spark).read(spark, path)
  def write(df: DataFrame, path: String): Unit =
    provider(df.sparkSession).write(df, path)
  def append(df: DataFrame, path: String): Unit =
    provider(df.sparkSession).append(df, path)
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    provider(df.sparkSession).overwritePartitions(df, path, partitionCols)
  def replaceTable(df: DataFrame, path: String,
                   partitionCols: Seq[String]): Unit =
    provider(df.sparkSession).replaceTable(df, path, partitionCols)
  def exists(spark: SparkSession, path: String): Boolean =
    provider(spark).exists(spark, path)
}
