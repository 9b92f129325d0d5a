package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val documents = spark.read.parquet(s"$sf/documents.parquet").cache()

  test("hash split: deterministic, complete, and near the target weights") {
    val s1 = Sampling.hashSplit(documents).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val s2 = Sampling.hashSplit(documents).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s1 == s2, "split assignment must be a pure function of (doc_id, salt)")
    assert(s1.size === documents.count(), "every doc gets exactly one split")
    val n = s1.size.toDouble
    val train = s1.values.count(_ == "train") / n
    // md5 is uniform: 90% +- a generous small-sample tolerance
    assert(train > 0.85 && train < 0.95, s"train fraction $train")
    // a different salt reassigns some docs (the salt is live)
    val s3 = Sampling.hashSplit(documents, salt = "other")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s3 != s1)
  }

  test("quota per stratum: heap aggregate == row_number window, no window in plan") {
    val got = Sampling.quotaPerStratum(documents, col("lang"), n = 7)
    import org.apache.spark.sql.catalyst.plans.logical.Window
    assert(got.queryExecution.optimizedPlan.collect { case w: Window => w }.isEmpty,
      "quota sampling must not plan a per-stratum window (full-corpus shuffle per stratum)")
    val gotRows = got.select("stratum", "rank", "doc_id")
      .as[(String, Int, Long)].collect().toSet
    val expected = documents
      .select(col("lang").as("stratum"), col("doc_id"),
        Sampling.hashValue(col("doc_id"), "graft").as("hv"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("stratum").orderBy(col("hv"), col("doc_id"))))
      .where(col("rank") <= 7)
      .select("stratum", "rank", "doc_id").as[(String, Int, Long)].collect().toSet
    assert(gotRows.nonEmpty && gotRows == expected)
  }

  test("packing: distributed prefix sum == global window, any partition count") {
    val reference = documents
      .select(col("doc_id"), size(graft.ops.Dedup.tokens(col("text"))).as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum("n_tokens").over(
          org.apache.spark.sql.expressions.Window.orderBy("doc_id")
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr("cum_before DIV 512").as("bin"),
        (col("cum_before") % 512).cast("int").as("bin_offset"))
      .as[(Long, Int, Long, Int)].collect().toSet
    for (span <- Seq(1L, 64L, 1000L, 1L << 20)) {
      val got = Sampling.packContiguous(documents, capacity = 512, blockSpan = span)
        .as[(Long, Int, Long, Int)].collect().toSet
      assert(got == reference, s"blockSpan $span changed the packing")
    }
    // scale guard: every window in the plan is partitioned EITHER by block
    // (per-block local cumsum) or runs over the one-row-per-block offsets
    // table — never an unpartitioned window over the corpus
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = Sampling.packContiguous(documents).queryExecution.optimizedPlan
    val unpartitioned = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(unpartitioned.nonEmpty && unpartitioned.forall(_.toString.contains("btotal")),
      "the only unpartitioned window is the driver-scale block-offset cumsum")
  }

  test("repetition: keeps first occurrences in order, ratios consistent") {
    val rows = Sampling.repetition(
      Seq((1L, "b a b c a b")).toDF("doc_id", "text")).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getInt(1) === 6 && r.getInt(2) === 3)
    assert(r.getString(4) === "b a c", "first-occurrence order, not sorted")
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-9)
    // empty-token docs are excluded, like every text op in the suite
    assert(Sampling.repetition(Seq((2L, "  ")).toDF("doc_id", "text")).count() === 0)
  }
}
