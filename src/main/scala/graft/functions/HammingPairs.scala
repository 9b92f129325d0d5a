package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused pair expansion + Hamming verify for one simhash chunk bucket.
  *
  * input:  array<struct<doc_id:long, sim:long>> (one bucket's members)
  * output: array<struct<doc_id_a, doc_id_b, hamming>> for the pairs with
  *         bit_count(xor) <= maxHamming, doc_id_a < doc_id_b.
  *
  * Why: the declarative form (util.Exprs.sortedPairs on structs + bit_count
  * + filter) materializes EVERY bucket pair as an interpreted struct before
  * filtering — ~|bucket|^2/2 allocations per bucket; this loop emits only
  * the passing pairs (measured ~2x on dedup_simhash at sf0.1). Members are
  * sorted by doc_id and truncated to the first maxItems — the same
  * deterministic hot-bucket cap as sortedPairs: a capped doc's pairs are
  * still discoverable through its other 7 chunk buckets.
  */
case class HammingPairs(child: Expression, maxHamming: Int, maxItems: Int = 1000)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id_a", LongType, nullable = false),
    StructField("doc_id_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false))))
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("hammingPairs", this)
      s"${ev.value} = $self.compute($c);"
    })

  /** Compiled body, shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val total = arr.numElements()
    val n = math.min(total, maxItems)
    val ids = new Array[Long](total)
    val sims = new Array[Long](total)
    var i = 0
    while (i < total) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0)
      sims(i) = s.getLong(1)
      i += 1
    }
    // sort members by doc_id (bucket members are distinct docs), then cap
    if (total > 1) {
      val order = Array.range(0, total).sortBy(ids)
      val ids2 = new Array[Long](total); val sims2 = new Array[Long](total)
      i = 0
      while (i < total) { ids2(i) = ids(order(i)); sims2(i) = sims(order(i)); i += 1 }
      System.arraycopy(ids2, 0, ids, 0, total)
      System.arraycopy(sims2, 0, sims, 0, total)
    }
    val out = new java.util.ArrayList[AnyRef](4)
    var a = 0
    while (a < n) {
      var b = a + 1
      while (b < n) {
        val h = java.lang.Long.bitCount(sims(a) ^ sims(b))
        if (h <= maxHamming) {
          out.add(InternalRow(ids(a), ids(b), h))
        }
        b += 1
      }
      a += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): HammingPairs =
    copy(child = c)
  override def prettyName: String = "hamming_pairs"
}

object HammingPairs {
  import org.apache.spark.sql.GraftBridge
  def apply(members: Column, maxHamming: Int): Column =
    apply(members, maxHamming, 1000)

  def apply(members: Column, maxHamming: Int, maxItems: Int): Column =
    GraftBridge.column(
      HammingPairs(GraftBridge.expression(members), maxHamming, maxItems))
}
