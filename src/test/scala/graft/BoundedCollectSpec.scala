package graft

import org.apache.spark.sql.functions._
import graft.functions.BoundedCollect

/** The size-bounded collect must be bit-identical to
  * slice(array_sort(collect_list(x)), 1, cap) — the retention rule of the
  * pair-expansion kernels — for every partitioning (merge order), including
  * groups far beyond the cap (the compaction path a hot bucket exercises).
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  private def reference(capped: Int) =
    slice(array_sort(collect_list(col("v"))), 1, capped)

  test("bounded collect == sorted-sliced collect_list across partitionings") {
    // 40 groups; group g has 3*g+1 members (1..121), values deliberately
    // unsorted and duplicated: v = (i * 37) % 100
    val rows = for { g <- 0 until 40; i <- 0 to 3 * g } yield (g, (i * 37L) % 100)
    for (parts <- Seq(1, 3, 16)) {
      val df = rows.toDF("g", "v").repartition(parts, col("v"))
      for (cap <- Seq(5, 64, 1000)) {
        val got = df.groupBy("g")
          .agg(BoundedCollect.longs(cap)(col("v")).as("ids"))
        val want = df.groupBy("g").agg(reference(cap).as("ids"))
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
          s"mismatch at parts=$parts cap=$cap")
      }
    }
  }

  test("struct variants keep the (doc_id-first) sort order and field names") {
    val rows = (0 until 500).map(i => (i % 7, (500 - i).toLong, i))
    val df = rows.toDF("g", "doc_id", "n").repartition(8, col("n"))
    val got = df.groupBy("g")
      .agg(BoundedCollect.docN(10)(col("doc_id"), col("n")).as("ids"))
      .select(col("g"), col("ids"))
    val want = df.groupBy("g")
      .agg(slice(array_sort(collect_list(struct(col("doc_id"), col("n")))), 1, 10)
        .as("ids"))
    // compare element struct types (containsNull differs: udaf output is
    // conservatively nullable) — field names/types must match for the
    // downstream col("p.a.doc_id") / col("p.a.n") accessors
    def elem(dt: org.apache.spark.sql.types.DataType) =
      dt.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(elem(got.schema("ids").dataType) === elem(want.schema("ids").dataType))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    val sims = (0 until 300).map(i => (i % 3, (300 - i).toLong, i.toLong * 7919))
    val sdf = sims.toDF("g", "doc_id", "sim").repartition(5, col("sim"))
    val sGot = sdf.groupBy("g")
      .agg(BoundedCollect.docSim(20)(col("doc_id"), col("sim")).as("m"))
    val sWant = sdf.groupBy("g")
      .agg(slice(array_sort(collect_list(struct(col("doc_id"), col("sim")))), 1, 20)
        .as("m"))
    assert(sGot.exceptAll(sWant).isEmpty && sWant.exceptAll(sGot).isEmpty)
  }
}
