package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over an array<string> of tokens, as one compiled loop —
  * bit j of the result is set iff the sum over tokens of (+1 if bit j of
  * hash(token) else -1) is positive. Same rationale as MinHashBands:
  * the HOF formulation pays one interpreted lambda per (bit x token).
  *
  * Token hash is FNV-1a 64 over the UTF-8 bytes: adequate diffusion for
  * simhash AND independently recomputable in ANSI SQL (the DuckDB oracle
  * folds the same constants in HUGEINT arithmetic mod 2^64), which turns
  * the dedup_simhash correctness row from rows-only into an exact
  * rows+schema+hash gate. Long arithmetic wraps silently in Scala — that
  * wraparound IS the mod-2^64. */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private final val FNV_BASIS = 0xcbf29ce484222325L
  private final val FNV_PRIME = 0x100000001b3L

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // one virtual call per row into this compiled body; the projection
      // around it stays inside whole-stage codegen (no fallback row
      // materialization)
      val self = ctx.addReferenceObj("simhash", this)
      s"${ev.value} = $self.compute($c);"
    })

  /** Compiled body, shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val b = arr.getUTF8String(i).getBytes
      var h = FNV_BASIS
      var k = 0
      while (k < b.length) {
        h = (h ^ (b(k) & 0xffL)) * FNV_PRIME
        k += 1
      }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  import org.apache.spark.sql.GraftBridge
  def apply(c: Column): Column = GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}
