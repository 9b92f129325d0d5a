package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.data.DocGen
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is exposed as a `queries` entry; each
  * SQL-expressible one has a DuckDB `oracleSql` twin computing the SAME
  * result from first principles (the deterministic injection predicates in
  * data.DocGen), so the oracle is an independent derivation, not a port of
  * the Spark plan.
  */
object SparkEntry {

  /** Flagship: the full constraint suite on sf0.001 (violations table). */
  def entry(spark: SparkSession): DataFrame =
    Validate.run(spark, "/root/testdata/sf0.001")._1

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- constraint-validation core -------------------------------------
    "validate_violations" -> ((s, d) =>
      Validate.violations(DocGen.docs(s, d), DocGen.mediaCatalogMap(s, d))),
    "validate_verdicts" -> ((s, d) =>
      Validate.verdicts(DocGen.docs(s, d), DocGen.mediaCatalogMap(s, d))),
    "span_roundtrip" -> ((s, d) =>
      Validate.spanFingerprint(DocGen.docs(s, d))),
    "uniqueness_dups" -> ((s, d) =>
      Uniqueness.duplicateKeys(DocGen.docs(s, d), "doc_id")),
    "referential_dangling" -> ((s, d) =>
      Referential.dangling(DocGen.docs(s, d), DocGen.mediaCatalog(s, d))),
    "temporal_order_weeks" -> ((s, d) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val o = s.read.parquet(s"$d/orders.parquet")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("days_between", datediff(col("l_shipdate"), col("o_orderdate")))
        .where(col("days_between") < 7)
        .select(
          concat(col("l_orderkey").cast("string"), lit("-"),
            col("l_linenumber").cast("string")).as("doc_id"),
          col("days_between"),
          lit("error").as("severity"),
          lit("R_SHIP_AFTER_ORDER").as("rule_id"))
    }),
    // ---- derivations (argmax / coalesce cascade / set-fold / report) ----
    "derive_latest_event" -> ((s, d) => Derive.latestEventPerUser(s, d)),
    "derive_censor_date" -> ((s, d) => Derive.censorDatePerOrder(s, d)),
    "derive_type_set" -> ((s, d) => Derive.eventTypeSetPerUser(s, d)),
    "report_quarterly" -> ((s, d) => Derive.quarterlyReport(s, d)),
    // ---- column stats / histogram / drift --------------------------------
    "stats_columns" -> ((s, d) =>
      Stats.columnStats(s.read.parquet(s"$d/documents.parquet"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),
    "stats_histogram" -> ((s, d) =>
      Stats.histogram(s.read.parquet(s"$d/documents.parquet"), "n_chars", 50.0, 10)),
    "drift_psi_ks" -> ((s, d) =>
      Drift.psiKs(s.read.parquet(s"$d/documents.parquet"), "n_chars",
        col("doc_id") % 2 === 1, 50.0, 10)),
    // ---- classic wide aggregation ----------------------------------------
    "q1_pricing_summary" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").cast("long").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          countDistinct("l_partkey").as("n_parts"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) / 100.0)
            .cast("long").as("revenue_hundreds")))
  )

  /** DuckDB oracles. Expected violations are recomputed from the injection
    * predicates (pure functions of l_orderkey) — an independent derivation
    * of the same truth. */
  def oracleSql: Map[String, String] = {
    val liCte =
      """WITH li AS (
        |  SELECT l_orderkey AS ok,
        |         CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS doc_id,
        |         l_partkey AS pk, l_returnflag AS rf, l_linestatus AS ls, l_quantity AS qty
        |  FROM lineitem)""".stripMargin
    Map(
      "validate_violations" -> (liCte +
        """
          |SELECT doc_id, 'R_KIND_PRESENT' AS rule_id, 'error' AS severity, 'spans/kind' AS path, 'span kind must be present' AS message FROM li WHERE ok%89=0 AND ok%71<>0
          |UNION ALL SELECT doc_id, 'R_KIND_VOCAB', 'error', 'spans/kind', 'span kind must be in vocabulary' FROM li WHERE ok%83=0 AND ok%71<>0
          |UNION ALL SELECT doc_id, 'R_MEDIA_REF_RESOLVES', 'fatal', 'spans/media_ref', 'span media_ref must resolve in media catalog' FROM li WHERE ok%79=0 AND ok%71<>0
          |UNION ALL SELECT doc_id, 'R_TEXT_FORMAT', 'error', 'spans/text', 'header text span must match ^[A-Z]{2}$' FROM li WHERE ok%73=0 AND ok%89<>0 AND ok%71<>0
          |UNION ALL SELECT doc_id, 'R_QTY_RANGE', 'error', 'spans/text', 'numeric text span must be in [1,50]' FROM li WHERE ok%61=0 AND ok%71<>0
          |UNION ALL SELECT doc_id, 'R_MEDIA_NO_TEXT', 'warning', 'spans/text', 'media span must not carry text' FROM li WHERE ok%67=0 AND ok%83<>0 AND ok%71<>0
          |UNION ALL SELECT doc_id, 'R_OFFSET_ORDER', 'error', 'spans/offset', 'span offsets must be strictly increasing' FROM li WHERE ok%97=0 AND ok%71<>0
          |UNION ALL SELECT doc_id, 'R_SPAN_COUNT', 'error', 'spans', 'doc must contain between 1 and 8 spans' FROM li WHERE ok%71=0
          |UNION ALL SELECT doc_id, 'R_HAS_MEDIA', 'info', 'spans', 'doc carries no media span' FROM li WHERE ok%71=0 OR ok%83=0""".stripMargin),
      "validate_verdicts" -> (liCte +
        """, f AS (SELECT doc_id,
          |  CAST(ok%79=0 AND ok%71<>0 AS INT) AS n_fatal,
          |  CAST(ok%89=0 AND ok%71<>0 AS INT) + CAST(ok%83=0 AND ok%71<>0 AS INT)
          |    + CAST(ok%97=0 AND ok%71<>0 AS INT) + CAST(ok%73=0 AND ok%89<>0 AND ok%71<>0 AS INT)
          |    + CAST(ok%61=0 AND ok%71<>0 AS INT) + CAST(ok%71=0 AS INT) AS n_error,
          |  CAST(ok%67=0 AND ok%83<>0 AND ok%71<>0 AS INT) AS n_warn,
          |  CAST(ok%71=0 OR ok%83=0 AS INT) AS n_info
          |FROM li)
          |SELECT doc_id,
          |  CASE WHEN n_fatal>0 THEN 'rejected' WHEN n_error>0 THEN 'invalid'
          |       WHEN n_warn>0 OR n_info>0 THEN 'acceptable' ELSE 'valid' END AS verdict,
          |  n_fatal, n_error, n_warn, n_info FROM f""".stripMargin),
      "span_roundtrip" -> (liCte +
        """
          |SELECT doc_id,
          | CASE WHEN ok%71=0 THEN '' ELSE
          |   (CASE WHEN ok%89=0 THEN '~' ELSE 'text' END) || ':' ||
          |   (CASE WHEN ok%73=0 THEN lower(rf||ls) ELSE rf||ls END) || ':~:0|' ||
          |   (CASE WHEN ok%83=0 THEN 'blob' ELSE 'media' END) || ':' ||
          |   (CASE WHEN ok%67=0 THEN 'leak' ELSE '~' END) || ':' ||
          |   (CASE WHEN ok%79=0 THEN 'x' ELSE 'm' END) || CAST(pk%1000 AS VARCHAR) || ':10|' ||
          |   'text:' ||
          |   (CASE WHEN ok%61=0 THEN '999' ELSE CAST(CAST(qty AS INT) AS VARCHAR) END) || ':~:' ||
          |   (CASE WHEN ok%97=0 THEN '5' ELSE '20' END) || '|'
          | END AS span_fp
          |FROM li""".stripMargin),
      "uniqueness_dups" ->
        """SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS doc_id,
          |       count(*) AS cnt
          |FROM lineitem GROUP BY 1 HAVING count(*) > 1""".stripMargin,
      "referential_dangling" ->
        """SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS doc_id,
          |       'x' || CAST(l_partkey%1000 AS VARCHAR) AS media_ref
          |FROM lineitem WHERE l_orderkey%79=0 AND l_orderkey%71<>0""".stripMargin,
      "temporal_order_weeks" ->
        """SELECT CAST(l.l_orderkey AS VARCHAR) || '-' || CAST(l.l_linenumber AS VARCHAR) AS doc_id,
          |       CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT) AS days_between,
          |       'error' AS severity, 'R_SHIP_AFTER_ORDER' AS rule_id
          |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |WHERE date_diff('day', o.o_orderdate, l.l_shipdate) < 7""".stripMargin,
      "derive_latest_event" ->
        """SELECT user_id, event_id, event_type, ts, value FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM events) t WHERE rn = 1""".stripMargin,
      "derive_censor_date" ->
        """SELECT o.o_orderkey,
          |       coalesce(r.last_returned, r.last_shipped, o.o_orderdate) AS censor_ts
          |FROM orders o LEFT JOIN (
          |  SELECT l_orderkey,
          |         max(CASE WHEN l_returnflag='R' THEN l_shipdate END) AS last_returned,
          |         max(l_shipdate) AS last_shipped
          |  FROM lineitem GROUP BY 1) r ON o.o_orderkey = r.l_orderkey""".stripMargin,
      "derive_type_set" ->
        """SELECT user_id, concat_ws(',',
          |  CASE WHEN has_click=1 THEN 'click' END,
          |  CASE WHEN has_error=1 THEN 'error' END,
          |  CASE WHEN has_purchase=1 THEN 'purchase' END,
          |  CASE WHEN has_signup=1 THEN 'signup' END,
          |  CASE WHEN has_view=1 THEN 'view' END) AS type_set
          |FROM (SELECT user_id,
          |  max(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS has_click,
          |  max(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS has_error,
          |  max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS has_purchase,
          |  max(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS has_signup,
          |  max(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS has_view
          |FROM events GROUP BY 1) t""".stripMargin,
      "report_quarterly" ->
        """SELECT CAST(year(ts) AS INT) AS yr, CAST(quarter(ts) AS INT) AS qtr, event_type,
          |       count(*) AS n_events, CAST(round(sum(value)) AS BIGINT) AS value_sum
          |FROM events GROUP BY 1,2,3""".stripMargin,
      "stats_columns" ->
        Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_total,
             |count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
             |CAST(min($c) AS VARCHAR) AS min_v, CAST(max($c) AS VARCHAR) AS max_v
             |FROM documents""".stripMargin
        }.mkString("\nUNION ALL\n"),
      "stats_histogram" ->
        """SELECT CAST(least(greatest(floor(n_chars/50.0), 0), 9) AS BIGINT) AS bucket,
          |       count(*) AS cnt
          |FROM documents GROUP BY 1""".stripMargin,
      "drift_psi_ks" ->
        """WITH b AS (
          |  SELECT CAST(least(greatest(floor(n_chars/50.0), 0), 9) AS BIGINT) AS bucket,
          |         CASE WHEN doc_id%2=1 THEN 1 ELSE 0 END AS cur
          |  FROM documents),
          |c AS (
          |  SELECT bucket,
          |         CAST(sum(CASE WHEN cur=0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          |         CAST(sum(CASE WHEN cur=1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
          |  FROM b GROUP BY 1),
          |e AS (
          |  SELECT bucket, ca, cb,
          |         CAST(sum(ca) OVER () AS BIGINT) AS na,
          |         CAST(sum(cb) OVER () AS BIGINT) AS nb,
          |         CAST(sum(ca) OVER (ORDER BY bucket) AS BIGINT) AS cuma,
          |         CAST(sum(cb) OVER (ORDER BY bucket) AS BIGINT) AS cumb
          |  FROM c)
          |SELECT 'psi' AS metric, round(sum((pa-pb)*ln(pa/pb)), 6) AS value
          |FROM (SELECT (ca+0.5)/(na+5.0) AS pa, (cb+0.5)/(nb+5.0) AS pb FROM e) t
          |UNION ALL
          |SELECT 'ks', round(max(abs(CAST(cuma AS DOUBLE)/na - CAST(cumb AS DOUBLE)/nb)), 6)
          |FROM e""".stripMargin,
      "q1_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
          |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
          |       count(*) AS n_rows,
          |       count(DISTINCT l_partkey) AS n_parts,
          |       CAST(round(sum(l_extendedprice*(1-l_discount))/100.0) AS BIGINT) AS revenue_hundreds
          |FROM lineitem GROUP BY 1,2""".stripMargin
    )
  }
}
