package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Profiling companion to the (frozen) Bench main — guide §1.4/§1.5:
  * times each selected query through the noop sink AND attributes the time
  * with a SparkListener: jobs launched, stages run, tasks run, shuffle
  * bytes written, input bytes read. Fixed per-job/per-stage scheduling
  * overhead dominates sandbox-scale queries, so "how many jobs/stages did
  * this query launch" is the first question the optimization loop asks.
  *
  * Output: one JSON line per query (not parsed by any driver — evidence
  * for OPTIMIZATION_r06.md only). Bench itself is untouched.
  */
object BenchExtra {
  private final class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var shuffleWrite = 0L
    @volatile var shuffleRead = 0L
    @volatile var input = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleRead += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        input += s.stageInfo.taskMetrics.inputMetrics.bytesRead
      }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; shuffleWrite = 0; shuffleRead = 0; input = 0
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
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
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup on the first selected query (JIT + codegen cache)
    names.headOption.foreach(n => try runOnce(n) catch { case _: Throwable => () })
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"benchextra: $name")
      val times = (1 to reps).map { _ =>
        acc.reset()
        try runOnce(name) catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name FAILED: ${e.getMessage}"); Double.NaN
        }
      }
      // listener counters are from the LAST rep (reset per rep); the bus is
      // async — a short sleep lets it drain (tooling-grade accuracy is fine)
      Thread.sleep(300)
      val best = times.filterNot(_.isNaN).minOption.getOrElse(-1.0)
      println(f"""{"q":"$name","sec":$best%.3f,"jobs":${acc.jobs},"stages":${acc.stages},"tasks":${acc.tasks},"shuf_w_mb":${acc.shuffleWrite / 1e6}%.2f,"shuf_r_mb":${acc.shuffleRead / 1e6}%.2f,"input_mb":${acc.input / 1e6}%.2f}""")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
