package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Reconcile, SchemaCheck}
import graft.model.Schemas

class SchemaCheckSpec extends SparkSpec {
  import spark.implicits._
  import SchemaCheck.ColContract

  test("schema: conforming table yields zero violations") {
    val out = SchemaCheck.violations(spark, Schemas.docSchema, Seq(
      ColContract("doc_id", StringType),
      ColContract("spans", Schemas.spanArray)))
    assert(out.count() == 0)
  }

  test("schema: missing / type-drift / unexpected each classified, nested drift surfaces on the column") {
    val driftedSpan = ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("text", StringType),
      StructField("media_ref", StringType),
      StructField("offset", LongType)))) // int -> long drift INSIDE the struct
    val actual = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("spans", driftedSpan),
      StructField("ingest_ts", TimestampType))) // not in contract
    val contract = Seq(
      ColContract("doc_id", StringType),
      ColContract("spans", Schemas.spanArray),
      ColContract("lang", StringType)) // absent from actual

    val rows = SchemaCheck.violations(spark, actual, contract).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size == 3)
    assert(rows("lang").getAs[String]("rule_id") == "R_COL_MISSING")
    assert(rows("lang").getAs[String]("actual_type") == "-")
    val spans = rows("spans")
    assert(spans.getAs[String]("rule_id") == "R_COL_TYPE")
    assert(spans.getAs[String]("expected_type").contains("offset:int"))
    assert(spans.getAs[String]("actual_type").contains("offset:bigint"))
    assert(rows("ingest_ts").getAs[String]("rule_id") == "R_COL_UNEXPECTED")
    assert(rows("ingest_ts").getAs[String]("severity") == "warning")
  }

  test("sequence precondition: flags targets with no strictly-earlier required event, per entity") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val events = Seq(
      // user 1: purchase BEFORE any click -> violation; later purchase ok
      (1L, 1L, ts(10), "purchase"),
      (1L, 2L, ts(20), "click"),
      (1L, 3L, ts(30), "purchase"),
      // user 2: click first -> no violation
      (2L, 4L, ts(10), "click"),
      (2L, 5L, ts(11), "purchase"),
      // user 3: purchase at the SAME ts as the click but larger id ->
      // click sorts strictly earlier in the (ts, id) total order -> ok
      (3L, 6L, ts(10), "click"),
      (3L, 7L, ts(10), "purchase"),
      // user 4: purchase only -> violation
      (4L, 8L, ts(5), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")

    val out = Reconcile.requiresPriorEvent(events,
        "user_id", "event_type", "ts", "event_id",
        target = "purchase", required = "click",
        ruleId = "R_PURCHASE_NEEDS_CLICK")
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(1L, 8L))
  }

  test("sequence precondition: single entity-key shuffle, no join") {
    val events = graft.data.Tables.read(spark, sf, "events")
    val plan = Reconcile.requiresPriorEvent(events,
      "user_id", "event_type", "ts", "event_id",
      "purchase", "click", "R_X").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"precondition must not join:\n$plan")
    // exclude Tables.read's deterministic-hash scan fan-out (xxhash64 key)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length -
      "hashpartitioning\\(xxhash64".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one keyed shuffle, got $shuffles:\n$plan")
  }
}
