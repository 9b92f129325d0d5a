package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.streaming.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("stateful sessionization: closed sessions match a batch window computation") {
    val dir = Files.createTempDirectory("graft-sess")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val gapMs = 6 * 3600 * 1000L // 6h gap
    val stream = spark.readStream
      .schema(graft.streaming.StreamValidate.eventsSchema)
      .parquet(dir.toString)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Sessionize.Event]
    val q = Sessionize.sessionize(spark, stream, gapMs)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sessions")
      .select("user_id", "start_ts", "end_ts", "n_events")

    // batch ground truth: gap-based sessions via lag + cumulative session id
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val batch = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> TZ for epoch math
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          col("ts").cast("long") - col("prev").cast("long") > gapMs / 1000, 1)
          .otherwise(0))
      .withColumn("sess", sum("new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess")
      .agg(min("ts").as("start_ts"), max("ts").as("end_ts"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_ts", "end_ts", "n_events")

    // the stream emits gap-closed sessions plus any final session whose
    // event-time timeout fired before end-of-input; a user's final session
    // may stay open in state. Invariants: everything emitted is a true
    // session, and every NON-final session is emitted.
    val lastPerUser = batch
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("end_ts").desc)))
      .where(col("rn") === 1).drop("rn")
    val nonFinal = batch.exceptAll(lastPerUser)
    assert(streamed.exceptAll(batch).isEmpty,
      "every emitted session must exist in the batch ground truth")
    assert(nonFinal.exceptAll(streamed).isEmpty,
      "every gap-closed session must be emitted")
    assert(streamed.count() >= nonFinal.count() && streamed.count() > 0)

    // the library batch operator must equal the same ground truth exactly
    // (including the final open session of every user), modulo the
    // micros-epoch output encoding
    val lib = Sessionize.sessionizeBatch(
      spark.read.parquet(s"$sf/events.parquet"), gapMs)
    val truth = batch.select(
      col("user_id"),
      unix_micros(col("start_ts").cast("timestamp")).as("start_us"),
      unix_micros(col("end_ts").cast("timestamp")).as("end_us"),
      col("n_events"))
    assert(lib.exceptAll(truth).isEmpty && truth.exceptAll(lib).isEmpty,
      "sessionizeBatch must equal the gap-session ground truth")
  }

  test("open session flushes via event-time timeout once the watermark passes it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Sessionize.Event]
    val gapMs = 3600L * 1000 // 1h gap; watermark delay in sessionize is 1h
    // offset away from epoch 0: the stateful operator's late-data filter
    // drops rows with ts <= watermark, and the INITIAL watermark is 0 — an
    // epoch-0 event silently vanishes
    def ts(min: Long) = new java.sql.Timestamp((min + 1000) * 60000L)
    val q = Sessionize.sessionize(spark, ms.toDS(), gapMs)
      .writeStream.format("memory").queryName("sess_flush")
      .outputMode("append").start()
    try {
      // user 7's session stays OPEN after its batch: nothing is emitted
      ms.addData(Sessionize.Event(1, ts(0), 7L, "click", 0.0),
        Sessionize.Event(2, ts(30), 7L, "click", 0.0))
      q.processAllAvailable()
      assert(spark.table("sess_flush").isEmpty,
        "an open session must not be emitted before its timeout")
      // a far-future event for ANOTHER user advances the event-time
      // watermark far past user 7's timeout (last=30min + 60min gap); the
      // timeout handler fires on the NEXT batch after the watermark update
      ms.addData(Sessionize.Event(3, ts(100000), 8L, "view", 0.0))
      q.processAllAvailable()
      ms.addData(Sessionize.Event(4, ts(100001), 8L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_flush")
        .select("user_id", "start_ts", "end_ts", "n_events")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect()
      assert(got.contains((7L, ts(0), ts(30), 2L)),
        s"the state-eviction path must flush user 7's open session; got ${got.mkString(", ")}")
      assert(got.forall(_._1 == 7L),
        "user 8's session is still open and must NOT flush")
    } finally q.stop()
  }
}
