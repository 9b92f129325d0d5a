package graft

import org.apache.spark.sql.functions._
import graft.data.DocGen
import graft.engine._

class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("expectation suite: hand-computed violations in one scan, rate budget honored") {
    import graft.engine.Expectations._
    val df = Seq(
      (1L, "a", "en", 10L),
      (2L, null.asInstanceOf[String], "en", 500L),
      (2L, "c", "xx", -3L),
      (3L, "d", null.asInstanceOf[String], 20L)
    ).toDF("id", "text", "lang", "n")
    val got = graft.engine.Expectations.run(df, Seq(
      NotNull("text"), NotNull("lang"), Unique("id"),
      InSet("lang", Seq("en", "de")), Between("n", 0L, 400L),
      Matches("text", "^[a-z]$", allowed = 1)))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._5))).toMap
    assert(got(("text", "not_null")) == ((1L, false)))
    assert(got(("lang", "not_null")) == ((1L, false)))
    assert(got(("id", "unique")) == ((1L, false)))     // 4 rows, 3 ids
    assert(got(("lang", "in_set")) == ((1L, false)))   // xx (null not counted)
    assert(got(("n", "between")) == ((2L, false)))     // 500 and -3
    assert(got(("text", "matches")) == ((0L, true)))   // all match; budget 1
    // the whole suite is ONE scan of the input, map-side combined
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.engine.Expectations.run(docs, Seq(
      NotNull("text"), Unique("doc_id"), Between("n_chars", 0L, 400L)))
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size == 1,
      s"expectation suite must scan the table once:\n$plan")
  }


  test("uniqueness: salted two-phase equals naive groupBy") {
    val docs = DocGen.docs(spark, sf)
    val salted = Uniqueness.duplicateKeys(docs, "doc_id", saltBuckets = 8)
      .as[(String, Long)].collect().toMap
    val naive = docs.groupBy("doc_id").count().where(col("count") > 1)
      .as[(String, Long)].collect().toMap
    assert(salted == naive)
    assert(naive.nonEmpty, "sf0.001 should contain natural duplicate doc_ids")
  }

  test("referential: dangling refs are exactly the injected x-prefixed ones") {
    val d = Referential.dangling(DocGen.docs(spark, sf), DocGen.mediaCatalog(spark, sf))
    val refs = d.select("media_ref").as[String].collect()
    assert(refs.nonEmpty && refs.forall(_.startsWith("x")))
  }

  test("referential: broadcasts a small catalog") {
    val d = Referential.dangling(DocGen.docs(spark, sf), DocGen.mediaCatalog(spark, sf))
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"small catalog must broadcast:\n$plan")
  }

  test("stats: hand-computed values on a fixed frame") {
    val df = Seq(
      (Some("a"), 1), (Some("b"), 2), (None, 3), (Some("a"), 4)
    ).toDF("s", "n")
    val st = Stats.columnStats(df, Seq("s", "n")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(st("s").getAs[Long]("n_null") == 1)
    assert(st("s").getAs[Long]("n_distinct") == 2)
    assert(st("s").getAs[String]("min_v") == "a" && st("s").getAs[String]("max_v") == "b")
    assert(st("n").getAs[Long]("n_total") == 4)
    assert(st("n").getAs[String]("max_v") == "4")
  }

  test("drift: identical halves give psi ~ 0 and ks = 0") {
    val df = (0 until 1000).map(i => (i % 100, i % 2)).toDF("v", "half")
    val m = Drift.psiKs(df, "v", col("half") === 1, 10.0, 10)
      .as[(String, Double)].collect().toMap
    assert(math.abs(m("psi")) < 1e-9)
    assert(m("ks") == 0.0)
  }

  test("drift: shifted distribution is detected") {
    val df = ((0 until 500).map(i => (i % 50, 0)) ++ (0 until 500).map(i => (50 + i % 50, 1)))
      .toDF("v", "half")
    val m = Drift.psiKs(df, "v", col("half") === 1, 10.0, 10)
      .as[(String, Double)].collect().toMap
    assert(m("psi") > 1.0, s"disjoint ranges must yield large PSI, got ${m("psi")}")
    assert(m("ks") > 0.9)
  }

  test("drift timeline: stable periods stay near zero, the shifted period spikes") {
    // periods a,b identical uniform [0,100); period c shifted to [50,150)
    val rows = (0 until 1000).map(i => ("a", i % 100)) ++
      (0 until 1000).map(i => ("b", i % 100)) ++
      (0 until 1000).map(i => ("c", 50 + i % 100))
    val df = rows.toDF("p", "v")
    val out = Drift.psiTimeline(df, "p", "v", width = 15.0, nBuckets = 10)
      .collect().map(r => r.getAs[String]("period") -> r.getAs[Double]("psi")).toMap
    assert(out.keySet == Set("b", "c")) // first period has no predecessor
    assert(math.abs(out("b")) < 1e-9, s"identical periods must give ~0, got ${out("b")}")
    assert(out("c") > 0.5, s"shifted period must spike, got ${out("c")}")
    // totals carried as evidence
    val row = Drift.psiTimeline(df, "p", "v", 15.0, 10)
      .where(col("period") === "c").head()
    assert(row.getAs[Long]("n_prev") == 1000L && row.getAs[Long]("n_cur") == 1000L)
  }

  test("drift timeline plan: one keyed shuffle for the histogram, window only over the period frame") {
    val o = spark.read.parquet(s"$sf/orders.parquet").select(
      date_format(col("o_orderdate"), "yyyy-MM").as("m"), col("o_totalprice"))
    val df = Drift.psiTimeline(o, "m", "o_totalprice", 60000.0, 10)
    val plan = df.queryExecution.executedPlan.toString
    val keyed = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one shuffle for the per-period aggregate + the single-partition
    // exchange feeding the O(periods) window
    assert(keyed == 1, s"expected one keyed shuffle:\n$plan")
    assert(plan.contains("partial"), "histogram must partial-aggregate map-side")
  }

  test("predicates and projections push down to the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_quantity") > 49).select("l_orderkey", "l_quantity")
    val s = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(s.contains("PushedFilters") && s.contains("GreaterThan(l_quantity"),
      s"filter must reach the scan:\n$s")
    assert(!s.contains("l_extendedprice"), "unused columns must be pruned")
  }

  test("fact read adds no shuffle when the scan already splits") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tables").toString
    spark.range(20000).selectExpr("id AS l_orderkey").repartition(8)
      .write.parquet(s"$dir/lineitem.parquet")
    val oldOpen = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try {
      val df = graft.data.Tables.read(spark, dir, "lineitem")
      assert(df.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
      assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
        "a multi-partition input must not be repartitioned on the read path")
    } finally {
      spark.conf.set("spark.sql.files.openCostInBytes", oldOpen)
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        String.valueOf(128 * 1024 * 1024))
    }
  }

  test("bucketed tables join co-located: zero shuffle on the doc_id join") {
    val catalog = DocGen.mediaCatalogMap(spark, sf)
    val docs = DocGen.docs(spark, sf)
    graft.data.Tables.writeBucketed(docs, "docs_b", "doc_id", 8)
    graft.data.Tables.writeBucketed(
      Validate.verdicts(docs, catalog), "verdicts_b", "doc_id", 8)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the big-table path
    try {
      val j = spark.table("docs_b").join(spark.table("verdicts_b"), "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"equal-bucketed join must read matching buckets pairwise:\n$plan")
      assert(j.count() > 0)
      // and a groupBy on the bucket key needs no shuffle either
      val g = spark.table("verdicts_b").groupBy("doc_id").count()
      assert(!g.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
  }

  test("derive: censor cascade prefers returned > shipped > order date") {
    val got = Derive.censorDatePerOrder(spark, sf)
    assert(got.where(col("censor_ts").isNull).count() == 0)
  }

  test("derive: the status-gated cascade level is live (V6 4-level shape)") {
    // orders that resolve at level 2 (Finished, no returned lineitem) where
    // the gated value observably differs from the level-3 fallback
    val li = graft.data.Tables.read(spark, sf, "lineitem")
    val orders = graft.data.Tables.read(spark, sf, "orders")
    val agg = li.groupBy("l_orderkey").agg(
      max(when(col("l_returnflag") === "R", col("l_shipdate"))).as("lr"),
      max(when(col("l_linestatus") === "F", col("l_shipdate"))).as("lf"),
      max(col("l_shipdate")).as("ls"))
    val gated = orders.join(agg, col("o_orderkey") === col("l_orderkey"), "left")
      .where(col("o_orderstatus") === "F" && col("lr").isNull &&
        !(col("lf") <=> col("ls")))
    assert(gated.count() > 0, "expected level-2-resolved orders in the data")
    val joined = Derive.censorDatePerOrder(spark, sf)
      .join(gated, Seq("o_orderkey"))
    assert(joined.where(!(col("censor_ts") <=> coalesce(col("lf"), col("o_orderdate"))))
      .count() == 0, "level 2 must win over level 3 for Finished orders")
  }

  test("derive: latest event per user is unique and maximal") {
    val latest = Derive.latestEventPerUser(spark, sf)
    assert(latest.groupBy("user_id").count().where(col("count") > 1).count() == 0)
  }

  test("approx quantiles track the exact ones within summary tolerance") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = docs.agg(
      expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.9D))").as("qs"))
      .select(explode(col("qs"))).as[Double].collect()
    val approx = docs.agg(
      expr("approx_percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.9D), 10000)").as("qs"))
      .select(explode(col("qs")).as("q")).select(col("q").cast("double"))
      .as[Double].collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= math.max(2.0, e * 0.02), s"approx $a vs exact $e")
    }
  }
}
