package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.data.DocGen
import graft.engine.{Checkpoint, Validate}

class CheckpointSpec extends SparkSpec {

  test("resume after mid-run failure completes and equals a one-shot run") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    // attempt 1 dies before bucket 5
    intercept[Checkpoint.InjectedFailure] {
      Checkpoint.run(spark, sf, dir, nBuckets = 8, failBeforeBucket = Some(5))
    }
    val after1 = Checkpoint.completedBuckets(spark, dir)
    assert(after1 == Set(0, 1, 2, 3, 4))
    // attempt 2 resumes: only the remaining buckets run
    val resumed = Checkpoint.run(spark, sf, dir, nBuckets = 8, runId = "r2")
    assert(resumed == Seq(5, 6, 7))
    // stitched result equals the one-shot full pass
    val stitched = Checkpoint.verdicts(spark, dir)
      .select("doc_id", "verdict", "n_fatal", "n_error", "n_warn", "n_info")
    val oneShot = Validate.verdicts(DocGen.docs(spark, sf),
      DocGen.mediaCatalogMap(spark, sf))
    assert(stitched.count() == oneShot.count())
    assert(stitched.exceptAll(oneShot).isEmpty && oneShot.exceptAll(stitched).isEmpty)
    // lineage carries per-bucket metrics
    val lin = spark.read.parquet(Checkpoint.lineagePath(dir))
    assert(lin.count() == 8)
    assert(lin.agg(sum("n_docs")).collect().head.getLong(0) == oneShot.count())
    // per-rule metrics table: stitched per-bucket counts equal one-shot
    val ruleCounts = spark.read.parquet(s"$dir/rule_metrics")
      .groupBy("rule_id").agg(sum("count").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShotRules = Validate.violations(DocGen.docs(spark, sf),
        DocGen.mediaCatalogMap(spark, sf))
      .groupBy("rule_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ruleCounts == oneShotRules)
  }

  test("re-running a completed checkpoint is a no-op (idempotent)") {
    val dir = Files.createTempDirectory("graft-ckpt2").toString
    assert(Checkpoint.run(spark, sf, dir, nBuckets = 4).size == 4)
    assert(Checkpoint.run(spark, sf, dir, nBuckets = 4).isEmpty)
  }

  test("resume under a different bucketing or input fails fast") {
    val dir = Files.createTempDirectory("graft-ckpt3").toString
    assert(Checkpoint.run(spark, sf, dir, nBuckets = 4).size == 4)
    // nBuckets changed: bucket membership differs -> must not silently skip
    intercept[IllegalStateException] {
      Checkpoint.run(spark, sf, dir, nBuckets = 8)
    }
    // input changed: lineage is for another table snapshot
    intercept[IllegalStateException] {
      Checkpoint.run(spark, "/root/testdata/sf0.01", dir, nBuckets = 4)
    }
  }
}
