package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every registered query on SPARK_GRAFT_SF_DIR at
  * local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...}
  * plus docs_per_sec (the north metric: full-constraint-suite validated
  * docs/sec, measured on the validate_verdicts pass) and cpus.
  *
  * Queries are forced through the noop sink — a count() would let Catalyst
  * prune the whole rule projection and time an empty scan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing floor: with parallelismFirst (default) the coalesce
      // target is max(totalBytes/defaultParallelism, minPartitionSize); a
      // 1-byte floor means "never coalesce below default parallelism".
      // Shuffle BYTES are a bad proxy for this engine's CPU-heavy-per-byte
      // stages (minhash/shingle/LSH projections): the default 1MB floor
      // serialized the whole dedup_minhash_lsh verify onto ONE task
      // (9.1 s -> 1.7 s at sf0.1, measured). At production byte scales
      // totalBytes/parallelism >> 1MB, so behavior there is unchanged.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // min over reps: single-shot timings are dominated by per-plan codegen
    // compilation + JIT warmup (~0.3-0.5 s/query) and shared-host noise —
    // the min measures the engine, not the compiler or the neighbors
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // optional comma-separated query filter for focused profiling runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(name: String): Double = time {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    // host-health calibration: a fixed single-thread integer workload
    // (~0.2 s on an unloaded core). This box is a shared-host microVM with
    // INVISIBLE neighbor contention (steal/bandwidth do not appear in psi
    // or guest top, measured): when a calib sample is 3-15x its floor, the
    // same window's query timings are inflated by the host, not the engine.
    // Reported per round so bench variance is attributable.
    def calibrate(): Double = time {
      var s = 0L; var i = 0
      while (i < 100000000) { s = s * 6364136223846793005L + i; i += 1 }
      if (s == 42L) System.err.println("")  // defeat dead-code elimination
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // JIT/IO warmup (not counted) on the flagship pass — or, in a filtered
    // profiling run, on the first selected query (an unrelated warmup would
    // pollute focused timings). try: a warmup failure must not sink the
    // whole bench — the per-round loop records real failures per query.
    val warm = if (only.isEmpty) Some("validate_verdicts") else names.headOption
    warm.foreach(n => try force(n) catch { case _: Throwable => () })
    // reps are INTERLEAVED round-robin (all queries once, then again):
    // shared-host noise windows last minutes — back-to-back reps of one
    // query all land inside a bad window, while interleaved rounds give
    // every query a sample from each window, so min-over-rounds recovers
    // the clean-host timing (measured: back-to-back min 28 s vs
    // steady-state 2.5 s for the same query during one noise window)
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val calib = (1 to reps).map { r =>
      val c = calibrate()
      names.foreach { name =>
        // per-rep try: a transient failure must not discard other reps'
        // timings; -1.0 only when every rep failed
        try {
          val t = force(name)
          System.err.println(f"[bench-rep] $name round$r $t%.2f s")
          samples(name) = t :: samples(name)
        } catch { case _: Throwable => () }
      }
      c
    }
    val results = names.map { name =>
      val sec = if (samples(name).isEmpty) -1.0 else samples(name).min
      System.err.println(f"[bench] $name%-24s $sec%8.2f s")
      name -> sec
    }
    val nDocs = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val verdictSec = results.toMap.getOrElse("validate_verdicts", -1.0)
    val docsPerSec = if (verdictSec > 0) nDocs / verdictSec else -1.0
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    // Locale.ROOT: the f-interpolator uses the JVM default locale, which
    // would emit comma decimals (and silently corrupt the JSON) on
    // comma-decimal-locale hosts
    val cal = calib.map(c => String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(c))).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"n_docs":$nDocs,"docs_per_sec":$docsPerSec,"calib_sec":$cal}""")
    spark.stop()
  }
}
