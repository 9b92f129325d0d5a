package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-capture main for the optimization evidence trail: writes
  * `df.explain("formatted")` for every registered query (or the
  * SPARK_GRAFT_BENCH_ONLY subset) to
  * `$SPARK_GRAFT_PLAN_DIR/<query>_$SPARK_GRAFT_PLAN_SUFFIX.txt`.
  *
  * Session config mirrors Bench exactly so the captured plans are the
  * plans the bench executes. Building a query's DataFrame runs its eager
  * side effects (index builds, driver-side training) — unavoidable, since
  * the returned probe/scoring plan does not exist until they ran; the
  * written file is the plan of the DataFrame the noop sink would force.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r06")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
        java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
        System.err.println(s"[plandump] wrote $p (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(300))
      }
    }
    spark.stop()
  }
}
