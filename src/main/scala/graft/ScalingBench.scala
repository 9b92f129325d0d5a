package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.data.DocGen
import graft.engine.Validate

/** Dedicated scaling-efficiency harness for the north metric.
  *
  * The per-query suite times at sf0.1 are 1–3 s and dominated by fixed
  * planning/scheduling overhead, which makes core-count comparisons noisy.
  * This main measures ONLY the full-constraint-suite validation pass over
  * an 8x-replicated doc set (~4.8M docs), 3 repetitions, min — at
  * local[$SPARK_GRAFT_CPUS]. Run at two core counts and divide for the
  * N-vs-4N scaling efficiency (BENCH/BASELINE.md).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // never AQE-coalesce below default parallelism (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val catalog = DocGen.mediaCatalogMap(spark, sfDir)
    val docs = DocGen.docs(spark, sfDir)
      .select(explode(sequence(lit(0), lit(mult - 1))).as("rep"),
        col("doc_id"), col("spans"))
      .select(concat(col("doc_id"), lit("#"), col("rep")).as("doc_id"), col("spans"))
    // cache the fanned-out docs: the sandbox parquet is one unsplittable
    // row group, so its scan (and the fan-out shuffle write) is inherently
    // single-threaded — a sandbox artifact a real multi-file table doesn't
    // have. Caching isolates the measured quantity: the validation pass.
    // Fixed partition count, independent of the measured core count: at
    // local[2] the natural 2-partition layout makes ~10M-doc cache blocks
    // that exceed the storage pool and silently fall out, so low-core runs
    // would re-scan parquet while high-core runs read memory — the uniform
    // layout keeps every run measuring the same in-memory input.
    val cached = docs.repartition(64).cache()
    val nDocs = cached.count()
    val verdicts = Validate.verdicts(cached, catalog)
    def once(): Double = {
      val t0 = System.nanoTime()
      verdicts.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // host-health calibration (same fixed workload as graft.Bench): ~0.13 s
    // floor on this box single-thread; a >=3x sample means that rep ran in
    // a neighbor-contended window and the min should discount it
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var s = 0L; var i = 0
      while (i < 100000000) { s = s * 6364136223846793005L + i; i += 1 }
      if (s == 42L) System.err.println("")
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (JIT)
    val samples = (1 to reps).map(_ => (calibrate(), once()))
    val best = samples.map(_._2).min
    val cal = samples.map(c => String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(c._1))).mkString("[", ",", "]")
    println(s"""{"metric":"scaling","cpus":$cpus,"n_docs":$nDocs,"sec":$best,"docs_per_sec":${nDocs / best},"sf":"$sfDir","mult":$mult,"calib_sec":$cal}""")
    spark.stop()
  }
}
