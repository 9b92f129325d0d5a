package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Compiled bloom-contamination kernel: tokenize (single-space split,
  * empties dropped — Dedup.tokens semantics), form distinct word 3-shingles
  * (Dedup.shingles semantics), xxhash64 each (seed 42 — the same SQL hash
  * that built the blob on the eval side) and probe the eval-set bloom
  * filter, returning (n_shingles, n_contam) from ONE tight compiled loop
  * over the raw text.
  *
  * Why not `size(filter(shingles(text), s => might_contain(...)))`:
  * higher-order functions are CodegenFallback (interpreted dispatch +
  * boxing per element), and Catalyst duplicates the producing expression
  * into the pushed-down filter predicate and each struct-field extraction
  * (3 full pipeline copies observed in the executed plan) — measured 8-9 s
  * at sf0.1 (5k docs) vs ~1.5 s for this kernel, identical result. The
  * remaining plan copies now each cost one cheap compiled pass.
  * Distinctness is computed on the 64-bit shingle hashes (sort + unique):
  * for a bloom PROBE a hash collision is indistinguishable from the
  * filter's own false positive, so the semantics match the declared
  * probabilistic contract. doGenCode emits one virtual call per row,
  * keeping the surrounding projection in whole-stage codegen (same pattern
  * as MinHashBands).
  */
case class BloomContamCount(child: Expression, blob: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", IntegerType, nullable = false),
    StructField("n_contam", IntegerType, nullable = false)))

  override def nullable: Boolean = child.nullable

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(blob))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("bloomContam", this)
      s"${ev.value} = $self.compute($c);"
    })

  /** Compiled body, shared by interpreted eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    // single-space split, empties dropped == filter(split(text," "), len>0)
    val parts = text.toString.split(" ").filter(_.nonEmpty)
    if (parts.length < 3)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0))
    val k = parts.length - 2
    val hashes = new Array[Long](k)
    var i = 0
    while (i < k) {
      val b = (parts(i) + " " + parts(i + 1) + " " + parts(i + 2))
        .getBytes(StandardCharsets.UTF_8)
      hashes(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    var n = 0
    var contam = 0
    var j = 0
    while (j < k) {
      if (j == 0 || hashes(j) != hashes(j - 1)) {
        n += 1
        if (bloom.mightContainLong(hashes(j))) contam += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, contam))
  }

  override protected def withNewChildInternal(c: Expression): BloomContamCount =
    copy(child = c)
  override def prettyName: String = "bloom_contam_count"
}

object BloomContamCount {
  import org.apache.spark.sql.GraftBridge

  /** `text` is the raw document text column. */
  def apply(text: Column, blob: Array[Byte]): Column =
    GraftBridge.column(BloomContamCount(GraftBridge.expression(text), blob))
}
