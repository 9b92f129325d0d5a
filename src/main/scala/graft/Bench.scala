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
  /** Locale.ROOT: the f-interpolator uses the JVM default locale, which would
    * emit comma decimals (and silently corrupt the JSON) on
    * comma-decimal-locale hosts. NaN (a failed rep) maps to JSON null.
    */
  private[graft] def f3(d: Double): String =
    if (d.isNaN) "null"
    else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  /** The FINAL stdout line: compact, always-parseable summary. The driver
    * captures the tail of stdout and parses the last JSON line, so the
    * per-query minimums and docs/sec live here and the big diagnostic maps
    * go on the (earlier) diagnostics line — round 4's single giant line
    * pushed `queries` out of the tail window ("parsed": null).
    */
  private[graft] def summaryLine(total: Double, queries: Seq[(String, Double)],
      sfDir: String, cpus: String, nDocs: Long, docsPerSec: Double): String = {
    val qs = queries.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"n_docs":$nDocs,"docs_per_sec":$docsPerSec}"""
  }

  /** The verbose diagnostics line (chronological per-rep samples, aligned
    * per-(query, rep) calib probes, optional per-stage trace) — printed
    * BEFORE the summary so tail capture never truncates the summary.
    */
  private[graft] def diagnosticsLine(names: Seq[String], sfDir: String,
      cpus: String, calib: Seq[Double],
      samples: collection.Map[String, List[Double]],
      calibQ: collection.Map[String, List[Double]],
      stages: Option[String]): String = {
    def seriesJson(m: collection.Map[String, List[Double]]): String =
      names.map(n => "\"" + n + "\":" +
        m.getOrElse(n, Nil).reverse.map(f3).mkString("[", ",", "]"))
        .mkString("{", ",", "}")
    val cal = calib.map(f3).mkString("[", ",", "]")
    val stagesJson = stages.map(s => s""","stages":$s""").getOrElse("")
    s"""{"metric":"diagnostics","sf":"$sfDir","cpus":$cpus,"calib_sec":$cal,"samples":${seriesJson(samples)},"calib_q":${seriesJson(calibQ)}$stagesJson}"""
  }

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
    // optional comma-separated query filter for focused profiling runs —
    // validated against the registry: a misspelled name must abort loudly,
    // not silently produce an empty run with value 0.0
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(
          s"[bench] unknown SPARK_GRAFT_BENCH_ONLY names: ${unknown.toSeq.sorted.mkString(", ")}\n" +
            s"[bench] registered: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
        spark.stop()
        sys.exit(2)
      }
    }

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
    // per-(query, rep) calibration probes: contended host windows last
    // minutes, so a probe taken right before each query timing pins WHICH
    // timings a noise window inflated — per-query attribution instead of
    // the old per-round guess
    val calibQ = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val calib = (1 to reps).map { r =>
      val c = calibrate()
      names.foreach { name =>
        // per-rep try: a transient failure must not discard other reps'
        // timings; -1.0 only when every rep failed
        // probe and timing are recorded TOGETHER: on a failed rep the
        // sample list gets NaN so calib_q(i) always aligns with samples(i)
        // (a probe with no matching sample silently breaks the documented
        // per-(query, rep) attribution)
        val probe = calibrate()
        try {
          val t = force(name)
          System.err.println(f"[bench-rep] $name round$r $t%.2f s")
          calibQ(name) = probe :: calibQ(name)
          samples(name) = t :: samples(name)
        } catch { case e: Throwable =>
          // swallowing a rep keeps the suite going, but the cause must be
          // visible — a NaN sample with a stderr trace keeps the series
          // aligned AND debuggable
          calibQ(name) = probe :: calibQ(name)
          samples(name) = Double.NaN :: samples(name)
          System.err.println(s"[bench-rep] $name round$r FAILED: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
        }
      }
      c
    }
    // per-stage trace of the minhash pipeline (banding -> candidate pairs
    // -> full verify): cumulative wall times so a contended window is
    // attributable to a stage, not just to the query. min over 2 reps,
    // interleaved with the same calibration probe.
    val stages: Option[String] =
      if (!names.contains("dedup_minhash_lsh")) None
      else try {
        val corpus = ops.Dedup.corpusWithNearDups(
          graft.data.Tables.read(spark, sfDir, "documents"))
        def stage(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
          val pairs = (1 to 2).map { _ =>
            (calibrate(),
              time(df.write.format("noop").mode("overwrite").save()))
          }
          (pairs.map(_._2).min, pairs.map(_._1).min)
        }
        val (bT, bC) = stage(ops.Dedup.minhashBanded(corpus))
        val (cT, cC) = stage(
          ops.Dedup.minhashCandidatePairs(ops.Dedup.minhashBanded(corpus)))
        def f(d: Double) =
          String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
        Some(s"""{"dedup_minhash_lsh":{"cum_banding":${f(bT)},"cum_candidates":${f(cT)},"full":${f(samples("dedup_minhash_lsh").min)},"stage_calib":[${f(bC)},${f(cC)}]}}""")
      } catch { case _: Throwable => None }
    val results = names.map { name =>
      val ok = samples(name).filterNot(_.isNaN)
      val sec = if (ok.isEmpty) -1.0 else ok.min
      System.err.println(f"[bench] $name%-24s $sec%8.2f s")
      name -> sec
    }
    val nDocs = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val verdictSec = results.toMap.getOrElse("validate_verdicts", -1.0)
    val docsPerSec = if (verdictSec > 0) nDocs / verdictSec else -1.0
    val total = results.map(_._2).filter(_ > 0).sum
    // TWO lines, verbose diagnostics FIRST, compact summary LAST — see the
    // Scaladoc on summaryLine/diagnosticsLine for why the order matters.
    println(diagnosticsLine(names, sfDir, cpus, calib, samples, calibQ, stages))
    println(summaryLine(total, results, sfDir, cpus, nDocs, docsPerSec))
    spark.stop()
  }
}
