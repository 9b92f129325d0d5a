package graft

import org.apache.spark.sql.functions._
import graft.data.DocGen
import graft.engine.{Repair, Validate}
import graft.rules.RuleSet

class RepairSpec extends SparkSpec {

  private lazy val catalog = DocGen.mediaCatalogMap(spark, sf)
  private lazy val docs = DocGen.docs(spark, sf)

  // doc_id is NOT unique in the corpus (uniqueness_dups exists for a
  // reason) — every comparison here is row-local, never a doc_id join.

  test("repair is idempotent: repairing a repaired corpus changes nothing") {
    def fp(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(""), (acc, s) => concat(acc,
        coalesce(s.getField("kind"), lit("~")), lit(":"),
        coalesce(s.getField("text"), lit("~")), lit(":"),
        coalesce(s.getField("media_ref"), lit("~")), lit(":"),
        s.getField("offset").cast("string"), lit("|")))
    val once = docs.select(col("doc_id"), Repair.repairSpans(col("spans")).as("spans"))
    val diff = once.select(fp(col("spans")).as("f1"),
        fp(Repair.repairSpans(col("spans"))).as("f2"))
      .where(col("f1") =!= col("f2"))
    assert(diff.count() == 0)
    // and the second pass finds nothing left to repair
    assert(once.select(sum(Repair.repairCount(col("spans")))).head().getLong(0) == 0L)
  }

  test("repaired corpus never fires the four normalization-covered rules") {
    val repaired = docs.select(col("doc_id"),
      Repair.repairSpans(col("spans")).as("spans"))
    val after = Validate.violations(repaired, catalog)
      .where(col("rule_id").isin("R_KIND_VOCAB", "R_TEXT_FORMAT",
        "R_HEADER_OFFSET_EQ"))
    assert(after.count() == 0)
    // media-text survives ONLY through the blob->media alias interaction
    // (text carried by a blob span is NOT dropped — the repair predicates
    // read the ORIGINAL kind), and that leftover is reported honestly
    val leftoverMediaText = Validate.violations(repaired, catalog)
      .where(col("rule_id") === "R_MEDIA_NO_TEXT")
    val expected = DocGen.lineitem(spark, sf)
      .where(col("l_orderkey") % 67 === 0 && col("l_orderkey") % 83 === 0 &&
        col("l_orderkey") % 71 =!= 0)
    assert(leftoverMediaText.count() == expected.count())
  }

  test("row-local before/after: fatal untouched, info never grows, repairs heal docs") {
    // before- and after-verdicts computed on the SAME row — no joins
    val before = Validate.withViolations(docs, catalog)
      .withColumnRenamed("violations", "v_before")
      .withColumn("n_repairs", Repair.repairCount(col("spans")))
      .withColumn("spans", Repair.repairSpans(col("spans")))
    val both = Validate.withViolations(before, catalog)
      .select(
        col("doc_id") +: col("n_repairs") +:
          (RuleSet.verdictCols(col("v_before")) ++
            RuleSet.verdictCols(col("violations")).zip(
              Seq("verdict_after", "n_fatal_after", "n_error_after",
                "n_warn_after", "n_info_after")).map { case (c, n) => c.as(n) }): _*)
    // refs are not repairable: the fatal class is bit-identical
    assert(both.where(col("n_fatal_after") =!= col("n_fatal")).count() == 0)
    // repair never ADDS an info finding
    assert(both.where(col("n_info_after") > col("n_info")).count() == 0)
    // zero repairs on a valid doc leaves it valid
    assert(both.where(col("n_repairs") === 0 && col("verdict") === "valid" &&
      col("verdict_after") =!= "valid").count() == 0)
    // and at least one invalid doc is fully healed on this corpus
    assert(both.where(col("verdict") === "invalid" &&
      col("verdict_after").isin("valid", "acceptable")).count() > 0)
  }

  test("repairAndRevalidate plan: projections only, zero shuffles off a single-partition input") {
    // docs() repartitions a partition-starved local scan (Tables.read fan-out),
    // so assert on the repair stage itself: no Exchange above the spans input
    val repaired = Repair.repairAndRevalidate(docs, catalog)
    val plan = repaired.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    val fanOut = "RoundRobinPartitioning|hashpartitioning\\(xxhash64".r
      .findAllIn(plan).length
    assert(exchanges == fanOut,
      s"repair must add no shuffle beyond the scan fan-out:\n$plan")
  }
}
