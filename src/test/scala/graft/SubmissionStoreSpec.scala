package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{SubmissionStore, TableIO, TableProvider}

class SubmissionStoreSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: (Int, Int, String, Long)*): DataFrame =
    rows.toDF("yr", "qtr", "event_type", "n_events")

  test("per-period persistence: idempotent replace, other periods intact") {
    val dir = Files.createTempDirectory("graft-subm").toString

    SubmissionStore.persist(
      report((2024, 1, "click", 10L), (2024, 2, "click", 20L)), dir, "run1")
    val v1 = SubmissionStore.read(spark, dir)
      .select("yr", "qtr", "event_type", "n_events", "run_id")
    assert(v1.count() === 2)

    // re-persist Q2 with corrected numbers: Q2 replaced, Q1 untouched
    SubmissionStore.persist(report((2024, 2, "click", 25L)), dir, "run2")
    val v2 = SubmissionStore.read(spark, dir)
      .select("yr", "qtr", "event_type", "n_events", "run_id")
      .as[(Int, Int, String, Long, String)].collect().toSet
    assert(v2 === Set(
      (2024, 1, "click", 10L, "run1"),
      (2024, 2, "click", 25L, "run2")))

    // idempotent: same persist twice -> same table
    SubmissionStore.persist(report((2024, 2, "click", 25L)), dir, "run2")
    val v3 = SubmissionStore.read(spark, dir)
      .select("yr", "qtr", "event_type", "n_events", "run_id")
      .as[(Int, Int, String, Long, String)].collect().toSet
    assert(v3 === v2)
  }

  test("quarterly report persists end-to-end from the derive operator") {
    val dir = Files.createTempDirectory("graft-subm-q").toString
    val rep = graft.engine.Derive.quarterlyReport(spark, sf)
    SubmissionStore.persist(rep, dir, "r1")
    val back = SubmissionStore.read(spark, dir)
      .select("yr", "qtr", "event_type", "n_events", "value_sum")
    assert(back.exceptAll(rep).isEmpty && rep.exceptAll(back).isEmpty)
  }

  test("TableIO provider is selected by conf; registered impl overrides default") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    object Recorder extends TableProvider {
      def read(s: SparkSession, p: String): DataFrame = {
        calls += s"read:$p"; s.emptyDataFrame
      }
      def write(df: DataFrame, p: String): Unit = calls += s"write:$p"
      def append(df: DataFrame, p: String): Unit = calls += s"append:$p"
      def overwritePartitions(df: DataFrame, p: String,
                              cols: Seq[String]): Unit =
        calls += s"owp:$p:${cols.mkString("+")}"
      def replaceTable(df: DataFrame, p: String,
                       cols: Seq[String]): Unit =
        calls += s"replace:$p:${cols.mkString("+")}"
      def exists(s: SparkSession, p: String): Boolean = {
        calls += s"exists:$p"; false
      }
    }
    TableIO.register("recorder", Recorder)
    spark.conf.set(TableIO.ProviderConf, "recorder")
    try {
      val df = Seq((1, 2)).toDF("a", "b")
      TableIO.write(df, "/x")
      TableIO.append(df, "/x")
      TableIO.overwritePartitions(df, "/x", Seq("a"))
      TableIO.read(spark, "/x")
      assert(!TableIO.exists(spark, "/x"))
      assert(calls.toList === List("write:/x", "append:/x", "owp:/x:a",
        "read:/x", "exists:/x"))
      // the engine's checkpoint existence probes ride the SAME seam: with
      // the recorder active (exists=false), completedBuckets must consult
      // the provider and report an empty checkpoint — not touch the FS
      calls.clear()
      assert(graft.engine.Checkpoint.completedBuckets(spark, "/ckpt").isEmpty)
      assert(calls.toList === List("exists:/ckpt/lineage"))

      spark.conf.set(TableIO.ProviderConf, "nope")
      intercept[IllegalArgumentException](TableIO.write(df, "/x"))
    } finally spark.conf.unset(TableIO.ProviderConf)

    // default provider round-trips through parquet
    val dir = Files.createTempDirectory("graft-tio").toString
    TableIO.write(Seq((1, "a")).toDF("k", "v"), dir)
    assert(TableIO.read(spark, dir).count() === 1)
  }
}
