package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.rules.{CoreRules, RuleSet}

/** Structured Streaming front-end for the same rule corpus.
  *
  * The reference is a synchronous request/response service (no streams,
  * MTBValidationService.scala:15-19); our batch engine is the primary path.
  * This module shows the rule columns are execution-mode agnostic: the
  * identical violations/verdict expressions run over `readStream` micro-
  * batches (incremental ingest validation), plus a watermarked tumbling-
  * window aggregation for streaming metrics — the two standard streaming
  * shapes (stateless transform; windowed stateful agg).
  */
object StreamValidate {

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming verdicts: readStream -> span derivation -> THE SAME rule
    * corpus -> per-doc verdict rows, continuously. */
  def verdictStream(spark: SparkSession, inputDir: String,
                    catalog: Map[String, String]): DataFrame = {
    val li = spark.readStream.schema(lineitemSchema).parquet(inputDir)
    val docs = graft.data.DocGen.docsFrom(li)
    docs
      .withColumn("violations",
        RuleSet.violationsArray(CoreRules.all(catalog, graft.data.DocGen.kindVocab,
          graft.data.DocGen.versionedCatalog(catalog.keys),
          graft.data.DocGen.latestCatalogVersion)))
      .select(col("doc_id") +: RuleSet.verdictCols(col("violations")): _*)
  }

  /** Watermarked tumbling-window event metrics (1-day windows, 1-day
    * late-data tolerance) — streaming analog of the quarterly report. */
  def windowedEventCounts(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(inputDir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value"))).cast("long").as("value_sum"))
}
