package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for a production validation run:
  * `spark-submit --class graft.RunValidation <jar> <inputDir> <outDir> [nBuckets] [runId]`
  * Executes the checkpointed, resumable bucketed validation pass
  * (engine.Checkpoint): verdicts + violations per bucket, lineage +
  * metrics appended, resume-safe on rerun. In local sandboxes it runs on
  * whatever master the environment provides (local[*] by default).
  */
object RunValidation {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunValidation <sfDir> <outDir> [nBuckets] [runId]")
    val Array(sfDir, outDir) = args.take(2)
    val nBuckets = if (args.length > 2) args(2).toInt else 64
    val runId = if (args.length > 3) args(3) else "r1"
    val builder = SparkSession.builder()
      .appName("graft-validation")
      // never AQE-coalesce below default parallelism (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects the master; default for bare JVM runs
    val spark = sys.props.get("spark.master").orElse(sys.env.get("MASTER"))
      .fold(builder.master("local[*]"))(builder.master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val done = engine.Checkpoint.run(spark, sfDir, outDir, nBuckets, runId)
    println(s"[graft] processed buckets: ${done.mkString(",")}")
    spark.stop()
  }
}
