package graft

import org.apache.spark.sql.functions._
import graft.data.DocGen
import graft.engine.{Reconcile, Validate}

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("verdict diff: transition matrix, bounded exemplars, absent sides reported") {
    val before = Seq(("d1", "valid"), ("d2", "invalid"), ("d3", "invalid"),
      ("d4", "rejected"), ("d5", "valid")).toDF("doc_id", "verdict")
    val after = Seq(("d1", "valid"), ("d2", "valid"), ("d3", "valid"),
      ("d4", "rejected"), ("d6", "valid")).toDF("doc_id", "verdict_after")
    val got = Reconcile.verdictDiff(before, after, k = 1)
      .as[(String, String, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("valid", "valid")) == ((1L, "d1")))
    assert(got(("invalid", "valid")) == ((2L, "d2"))) // k=1 keeps smallest id
    assert(got(("rejected", "rejected")) == ((1L, "d4")))
    // a doc dropped between runs and a doc introduced between runs are
    // both REPORTED transitions, never silently ignored
    assert(got(("valid", "absent")) == ((1L, "d5")))
    assert(got(("absent", "valid")) == ((1L, "d6")))
    assert(got.size == 5)
  }

  test("reconcile: classifies mismatch / no-lines / orphan-lines and stays silent on agreement") {
    val header = Seq(
      (1L, 1000L), // matches detail exactly -> no row
      (2L, 2000L), // detail sums to 1950 -> R_TOTAL_MISMATCH, diff +50
      (3L, 3000L)  // no detail lines -> R_NO_LINES
    ).toDF("order_key", "stored_cents")
    val detail = Seq(
      (1L, 4.0), (1L, 6.0),          // 1000 cents
      (2L, 19.5),                    // 1950 cents
      (4L, 1.0)                      // header missing -> R_ORPHAN_LINES
    ).toDF("order_key", "line_value")

    val out = Reconcile.orderTotalsFrom(header, detail)
      .collect().map(r => r.getAs[Long]("order_key") -> r).toMap

    assert(out.keySet == Set(2L, 3L, 4L), s"got ${out.keySet}")
    val m = out(2L)
    assert(m.getAs[String]("rule_id") == "R_TOTAL_MISMATCH")
    assert(m.getAs[String]("severity") == "error")
    assert(m.getAs[Long]("diff_cents") == 50L)
    assert(m.getAs[Long]("computed_cents") == 1950L)
    val nl = out(3L)
    assert(nl.getAs[String]("rule_id") == "R_NO_LINES")
    assert(nl.getAs[String]("severity") == "warning")
    assert(nl.getAs[Long]("n_lines") == 0L)
    assert(nl.getAs[Long]("computed_cents") == -1L)
    val orphan = out(4L)
    assert(orphan.getAs[String]("rule_id") == "R_ORPHAN_LINES")
    assert(orphan.getAs[String]("severity") == "fatal")
    assert(orphan.getAs[Long]("stored_cents") == -1L)
    assert(orphan.getAs[Long]("n_lines") == 1L)
  }

  test("fd: flags only keys whose dependent takes >1 value, with min/max evidence") {
    val df = Seq(
      (1L, "a"), (1L, "a"),            // consistent
      (2L, "a"), (2L, "b"), (2L, "c"), // violating, 3 values
      (3L, "z")                        // single row
    ).toDF("k", "dep")
    val out = Reconcile.fdViolations(df, Seq("k"), "dep", "R_FD_TEST")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("n_values") == 3L)
    assert(r.getAs[Long]("n_rows") == 3L)
    assert(r.getAs[String]("dep_min") == "a")
    assert(r.getAs[String]("dep_max") == "c")
    assert(r.getAs[String]("rule_id") == "R_FD_TEST")
  }

  test("examples: k smallest doc_ids, counts, and partitioning-invariance of the bounded collector") {
    val v = Seq(
      // rule A: 8 docs, doc d2 violates twice (n_violations > n_docs)
      ("A", "error", "d1"), ("A", "error", "d2"), ("A", "error", "d2"),
      ("A", "error", "d3"), ("A", "error", "d4"), ("A", "error", "d5"),
      ("A", "error", "d6"), ("A", "error", "d7"), ("A", "error", "d8"),
      // rule B: fewer docs than k
      ("B", "info", "d9"), ("B", "info", "d10")
    ).toDF("rule_id", "severity", "doc_id")

    def run(df: org.apache.spark.sql.DataFrame) =
      Reconcile.violationExamples(df, k = 3).collect()
        .map(r => r.getAs[String]("rule_id") -> r).toMap

    val out = run(v)
    assert(out("A").getAs[Long]("n_violations") == 9L)
    assert(out("A").getAs[Long]("n_docs") == 8L)
    assert(out("A").getAs[String]("examples") == "d1,d2,d3")
    assert(out("B").getAs[Long]("n_docs") == 2L)
    // lexicographic: "d10" < "d9"
    assert(out("B").getAs[String]("examples") == "d10,d9")

    // merge-order independence: same result from 1 and 7 partitions
    val out7 = run(v.repartition(7))
    assert(out7("A").getAs[String]("examples") == out("A").getAs[String]("examples"))
    assert(out7("B").getAs[String]("examples") == out("B").getAs[String]("examples"))
  }

  test("examples over the real violations table: every listed doc_id actually violates its rule") {
    val violations = Validate.violations(DocGen.docs(spark, sf), DocGen.mediaCatalogMap(spark, sf))
    val ex = Reconcile.violationExamples(violations, k = 5).collect()
    assert(ex.nonEmpty)
    val vset = violations.select("rule_id", "doc_id").as[(String, String)]
      .collect().toSet
    ex.foreach { r =>
      val rule = r.getAs[String]("rule_id")
      r.getAs[String]("examples").split(",").foreach { d =>
        assert(vset((rule, d)), s"exemplar $d does not violate $rule")
      }
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_violations"))
    }
  }
}
