package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-local top-n nearest-centroid assignment — the MAP-SIDE coarse
  * quantizer every IVF build/probe and SemDeDup assignment runs on each
  * vector.
  *
  * Replaces the former `crossJoin(broadcast(centroids)) + groupBy(id) +
  * TopKAgg` shape, which SHUFFLED the whole corpus (full-precision vectors
  * included) once per assignment just to regroup a point's nCells scores
  * that were already row-local after the broadcast join. With the centroid
  * table collected driver-side (an O(nCells x dim) index header — the same
  * driver-size class as the PQ codebook and SQ8 params sidecars, and the
  * same ceiling as the broadcast the old shape shipped), assignment is a
  * pure projection: zero Exchange, zero aggregation buffers, and the
  * corpus-scale IVF index build becomes scan -> assign -> encode ->
  * repartition-for-write — exactly one shuffle (the write clustering)
  * instead of two. This is the shape production ANN builds use (broadcast
  * quantizers, map-side assign).
  *
  * Arithmetic is BIT-IDENTICAL to the join formulation it replaces:
  * score(cell) = dot(v, cv) / (norm * cn) with `dot` the same sequential
  * left fold as functions.DotProduct, and the top-n selection uses
  * java.lang.Double.compare with ties broken by ascending cell id — the
  * exact TopKAgg order (NaN ranks greatest, -0.0 < 0.0), so oracle hashes
  * are unchanged.
  *
  * Output: array<long> of the n best cell ids in (score DESC, id ASC)
  * order. NULL on a null/mis-dimensioned vector or null element (callers
  * explode, so such a row drops out — the corpus is null-free by contract;
  * the old path would instead have produced a null score).
  */
case class NearestCells(left: Expression, right: Expression,
                        cellIds: Seq[Long], cvFlat: Seq[Double],
                        cns: Seq[Double], n: Int)
  extends BinaryExpression {
  require(n > 0 && cellIds.nonEmpty && cns.size == cellIds.size &&
    cvFlat.size % cellIds.size == 0,
    "centroid table must be (ids, flat vectors, norms) of equal cardinality")

  private val dim = cvFlat.size / cellIds.size

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"nearest_cells needs (array<double>, double), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  }

  @transient private lazy val ids: Array[Long] = cellIds.toArray
  @transient private lazy val cv: Array[Double] = cvFlat.toArray
  @transient private lazy val cn: Array[Double] = cns.toArray

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[java.lang.Double])

  /** Compiled body, shared by interpreted eval and generated code (same
    * single-virtual-call shape as LshBuckets/PqEncode.compute). */
  def compute(arr: ArrayData, normBoxed: java.lang.Double): ArrayData = {
    if (arr.numElements() != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      v(i) = arr.getDouble(i)
      i += 1
    }
    val top = NearestCells.topN(v, normBoxed.doubleValue(), ids, cv, cn, n)
    val out = new Array[Any](top.length)
    var o = 0
    while (o < top.length) { out(o) = java.lang.Long.valueOf(top(o)); o += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, norm) => {
      val self = ctx.addReferenceObj("nearestCells", this)
      s"""
         |${ev.value} = $self.compute($v, (java.lang.Double) $norm);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCells =
    copy(left = l, right = r)
  override def prettyName: String = "nearest_cells"
}

object NearestCells {
  import org.apache.spark.sql.GraftBridge
  def apply(v: Column, norm: Column, cellIds: Seq[Long], cvFlat: Seq[Double],
            cns: Seq[Double], n: Int): Column =
    GraftBridge.column(NearestCells(GraftBridge.expression(v),
      GraftBridge.expression(norm), cellIds, cvFlat, cns, n))

  /** The top-n selection itself, shared by the expression and the
    * driver-side tiny-query-batch path (Similarity collects the nQueries
    * query vectors once and assigns their probe cells here, so the probe
    * plan carries a LocalRelation instead of re-executing the query-side
    * scan per consumer). Order: (score DESC, id ASC) via
    * java.lang.Double.compare — identical to TopKAgg (NaN greatest,
    * -0.0 < 0.0); score(cell) = seqfold-dot(v, cv) / (norm * cn).
    *
    * The stride comes from the CENTROID table (cv.length / ids.length),
    * never from the input vector: a mis-dimensioned vector returns empty
    * (row dropped — the same fate the expression path's dim check gives
    * it) instead of reading misaligned centroid slices. */
  def topN(v: Array[Double], norm: Double, ids: Array[Long],
           cv: Array[Double], cn: Array[Double], n: Int): Array[Long] = {
    val nc = ids.length
    if (nc == 0) return Array.emptyLongArray
    val dim = cv.length / nc
    if (v.length != dim) return Array.emptyLongArray
    val k = math.min(n, nc)
    val topScore = new Array[Double](k)
    val topId = new Array[Long](k)
    var used = 0
    var c = 0
    while (c < nc) {
      var dot = 0.0
      var j = 0
      val off = c * dim
      while (j < dim) { dot += v(j) * cv(off + j); j += 1 }
      val score = dot / (norm * cn(c))
      val id = ids(c)
      // find insert position: first slot this candidate beats
      var pos = used
      var p = 0
      var found = false
      while (p < used && !found) {
        val cmp = java.lang.Double.compare(score, topScore(p))
        if (cmp > 0 || (cmp == 0 && id < topId(p))) { pos = p; found = true }
        p += 1
      }
      if (pos < k) {
        var q = math.min(used, k - 1)
        while (q > pos) { topScore(q) = topScore(q - 1); topId(q) = topId(q - 1); q -= 1 }
        topScore(pos) = score
        topId(pos) = id
        if (used < k) used += 1
      }
      c += 1
    }
    topId.take(used)
  }
}
