package graft

import org.apache.spark.sql.functions._
import graft.data.DocGen
import graft.engine.{Stats, Validate}

class PartitionMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("partitionMetrics totals reconcile with the per-doc verdicts") {
    val catalog = DocGen.mediaCatalogMap(spark, sf)
    val li = DocGen.lineitem(spark, sf)
      .withColumn("ship_day", date_format(col("l_shipdate"), "yyyy-MM-dd"))
    val docs = DocGen.docsFrom(li, keep = Seq("ship_day"))

    val pm = Validate.partitionMetrics(docs, catalog).collect()
    val verdicts = Validate.verdicts(DocGen.docs(spark, sf), catalog)

    // column sums across all partitions == global verdict-class counts
    val globalByClass = verdicts.groupBy("verdict").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def total(c: String) = pm.map(_.getAs[Long](c)).sum
    assert(total("n_docs") == verdicts.count())
    for (cls <- Seq("valid", "acceptable", "invalid", "rejected"))
      assert(total(s"n_$cls") == globalByClass.getOrElse(cls, 0L),
        s"class $cls mismatch")
    assert(total("n_fatal") ==
      verdicts.agg(sum("n_fatal")).head().getLong(0))
    // every partition row is internally consistent
    pm.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_valid") + r.getAs[Long]("n_acceptable") +
          r.getAs[Long]("n_invalid") + r.getAs[Long]("n_rejected"))
    }
  }

  test("partitionMetrics plan: exactly one shuffle, partial aggregation present") {
    val catalog = DocGen.mediaCatalogMap(spark, sf)
    val li = DocGen.lineitem(spark, sf)
      .withColumn("ship_day", date_format(col("l_shipdate"), "yyyy-MM-dd"))
    val df = Validate.partitionMetrics(DocGen.docsFrom(li, keep = Seq("ship_day")), catalog)
    val plan = df.queryExecution.executedPlan.toString
    // exclude Tables.read's deterministic-hash scan fan-out (xxhash64 key)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length -
      "hashpartitioning\\(xxhash64".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one keyed shuffle, got $shuffles:\n$plan")
    // the map-side partial aggregate is what bounds a hot partition's cost
    assert(plan.contains("partial"), s"no partial aggregation in:\n$plan")
  }

  test("outliers: median/MAD flags the planted extreme, not the mild wobble") {
    // group g: values tightly clustered at 100 +- 2 with one extreme 1000.
    // median=100, deviations {0,0,1,2,2,900} -> MAD=1.5; 3*MAD=4.5 flags
    // only the 900 deviation. A mean/stddev cut at 3 sigma would be pulled
    // to ~367 by the outlier itself; median/MAD is immune.
    val df = Seq(
      ("g", 1L, 100L), ("g", 2L, 100L), ("g", 3L, 101L),
      ("g", 4L, 98L), ("g", 5L, 102L), ("g", 6L, 1000L),
      // group h: uniform spread, no outliers
      ("h", 7L, 10L), ("h", 8L, 20L), ("h", 9L, 30L)
    ).toDF("grp", "id", "v")
    val out = Stats.outliers(df, "grp", "id", "v", k = 3.0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("id") == 6L)
    assert(r.getAs[Double]("med") == 100.5) // interpolated even-count median
    assert(r.getAs[Double]("abs_dev") == 899.5)
    assert(r.getAs[String]("rule_id") == "R_VALUE_OUTLIER")
  }

  test("heavyKeys: exact counts, ppm shares, deterministic tiebreak, top-k plan") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq("d")).toDF("k")
    val out = graft.engine.Stats.heavyKeys(df, "k", 3).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c")) // c beats d, b before c on key
    assert(out.head.getAs[Long]("cnt") == 6L)
    assert(out.head.getAs[Long]("ppm") == 461538L) // 6*1e6 div 13, exact
    val plan = graft.engine.Stats.heavyKeys(
      graft.data.Tables.read(spark, sf, "events"), "user_id", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a heap, not a global sort:\n$plan")
  }

  test("outliers plan: group medians broadcast against the fact, no window") {
    val o = graft.data.Tables.read(spark, sf, "orders").select(
      date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
      col("o_orderkey").as("order_key"),
      round(col("o_totalprice") * 100).cast("long").as("total_cents"))
    val df = Stats.outliers(o, "order_month", "order_key", "total_cents", 3.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"fact must not be window-partitioned:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"small medians side should broadcast:\n$plan")
  }
}
