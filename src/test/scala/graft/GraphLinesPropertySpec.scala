package graft

import graft.ops.Dedup

/** Property-style checks for the round-4 graph/line operators: both
  * connected-component variants must agree with an INDEPENDENT union-find
  * ground truth on random graphs (not just hand-picked shapes), and the
  * distributed line dedup must equal a single-node recomputation on
  * random multi-line corpora. Fixed seeds — deterministic failures. */
class GraphLinesPropertySpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb }
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }
  }

  test("components == union-find ground truth on random graphs (both variants)") {
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 1 to 3) {
      val nNodes = 20 + trial * 15
      val nEdges = nNodes + rnd.nextInt(nNodes)
      val edges = (1 to nEdges).map { _ =>
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val expected = unionFind(nodes, edges).toSet
      val df = edges.toDF("doc_id_a", "doc_id_b")
      val star = Dedup.dupClustersStar(df).as[(Long, Long)].collect().toSet
      assert(star == expected, s"trial $trial: star diverges from union-find")
      val prop = Dedup.dupClusters(df, maxIter = 30).as[(Long, Long)].collect().toSet
      assert(prop == expected, s"trial $trial: propagation diverges from union-find")
    }
  }

  test("line dedup == single-node recomputation on a random multi-line corpus") {
    val rnd = new scala.util.Random(20260818L)
    val heavyPool = (0 until 4).map(i => s"boilerplate line $i")
    val minDf = 3
    val docs = (0 until 60).map { id =>
      val nLines = 1 + rnd.nextInt(6)
      val lines = (0 until nLines).map { i =>
        if (rnd.nextDouble() < 0.4) heavyPool(rnd.nextInt(heavyPool.size))
        else s"unique content $id-$i ${rnd.nextInt(1000)}"
      }
      (id.toLong, lines)
    }
    // single-node truth: df over per-doc DISTINCT lines, strip heavy ones
    val df = docs.flatMap { case (id, ls) => ls.distinct.map(l => (l, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val heavy = df.filter(_._2 >= minDf).keySet
    val expected = docs.flatMap { case (id, ls) =>
      val kept = ls.filterNot(heavy)
      if (kept.isEmpty) None
      else Some((id, ls.size, ls.size - kept.size, kept.mkString("\n")))
    }.toSet
    val corpus = docs.map { case (id, ls) => (id, ls.mkString("\n")) }
      .toDF("doc_id", "text")
    val got = Dedup.lineDedup(corpus, minDocFreq = minDf)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == expected)
    // sanity: the random mix actually exercised both paths
    assert(expected.exists(_._3 > 0) && expected.exists(_._3 == 0))
  }
}
