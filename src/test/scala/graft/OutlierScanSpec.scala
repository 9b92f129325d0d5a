package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import graft.engine.Stats

/** stats_outliers scan discipline: median-then-MAD is inherently two passes
  * over the fact; the output join must NOT add a third. The narrow
  * fact⋈medians projection is persisted, so the fact parquet is read
  * exactly twice — once under the median aggregate and once into the cached
  * projection — and both downstream consumers (MAD aggregate, output join)
  * read the cache. Counted over the physical plan TREE (the plan string
  * prints the shared cached plan once per consumer, inflating counts).
  */
class OutlierScanSpec extends SparkSpec {

  // flatten through the AQE / query-stage wrappers (LeafExecNodes whose real
  // subplan hangs off a field, not off children)
  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case s: QueryStageExec => walk(s.plan)
    case _ => p +: p.children.flatMap(walk)
  }
  private def factScans(p: SparkPlan): Int =
    walk(p).count {
      case f: FileSourceScanExec => f.toString.contains("lineitem")
      case _ => false
    }

  test("fact parquet is scanned exactly twice; MAD + output join read the cache") {
    val fact = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag").as("grp"),
        col("l_orderkey").as("id"),
        (col("l_extendedprice") * 100).cast("long").as("cents"))
    val out = Stats.outliers(fact, "grp", "id", "cents", 1.5)
    assert(out.count() > 0) // materialize (and fill the cache)

    val nodes = walk(out.queryExecution.executedPlan)
    val caches = nodes.collect { case s: InMemoryTableScanExec => s }
    assert(caches.size == 2,
      s"expected MAD aggregate AND output join to read the cache, got ${caches.size}")
    // outside the cache the fact is never read directly — every consumer of
    // the fact⋈medians projection rides the cache
    assert(factScans(out.queryExecution.executedPlan) == 0,
      "no direct fact scan expected outside the cached projection")
    // the shared cached plan scans the fact exactly twice (median aggregate
    // + the projection side of the fact⋈medians join) and it executes ONCE
    // — total = 2 fact scans end to end
    val cachedPlans = caches.map(_.relation.cacheBuilder.cachedPlan).distinct
    assert(cachedPlans.size == 1, "both consumers must share ONE cached relation")
    assert(factScans(cachedPlans.head) == 2,
      s"cached projection must embed exactly 2 fact scans (median pass + join):\n${cachedPlans.head}")
  }
}
