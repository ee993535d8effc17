package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint kernel (Schleimer et al., SIGMOD'03): hash every
  * character k-gram, then keep the distinct minima of each window of `w`
  * consecutive k-gram hashes — the whole document-fingerprinting pass as one
  * scalar function.
  *
  * Why a kernel and not built-ins: the composable formulation (posexplode
  * positions → xxhash64(substr) → window-min → distinct) is correct and
  * linear, but at scale it shuffles one row PER CHARACTER of the corpus for
  * the per-doc window sort — ~40 M rows for a 50 k-doc corpus, the top cost
  * of the whole bench. Winnowing is a per-document sequential algorithm with
  * zero cross-row dependencies, so the 100 TB-correct plan is a narrow map:
  * this expression computes the fingerprint set inside whole-stage codegen
  * (one static call per row), and the only shuffle left in the query is the
  * output ordering. Measured ~5× on the sf0.1 corpus, more at scale.
  *
  * The hash family is EXACTLY Spark's `xxhash64(substr(text, i, k))` (XXH64
  * of the k-gram's UTF-8 bytes, seed 42), so the result is bit-identical to
  * the built-in formulation — asserted in DedupSpec, which keeps the
  * composable version as this kernel's oracle.
  */
object WinnowKernel {

  /** Distinct window-minima of k-gram hashes, sorted ascending. Returns an
    * empty array when the text is shorter than one full window (k+w-1
    * chars). */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = text.numChars()
    val n = nChars - k + 1 // k-gram count
    val m = n - w + 1      // window count
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hashes = new Array[Long](n)
    if (text.numBytes() == nChars) {
      // ASCII fast path: byte index == char index, hash ranges in place —
      // no per-position substring allocation
      val base = text.getBaseObject
      val off = text.getBaseOffset
      var i = 0
      while (i < n) {
        hashes(i) = XXH64.hashUnsafeBytes(base, off + i, k, 42L)
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val sub = text.substring(i, i + k)
        hashes(i) = XXH64.hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset, sub.numBytes, 42L)
        i += 1
      }
    }
    // sliding-window minimum via monotonic deque — O(n), not O(n·w)
    val mins = new Array[Long](m)
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      while (tail > head && hashes(dq(tail - 1)) >= hashes(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - (w - 1)) = hashes(dq(head))
      i += 1
    }
    // distinct via sort+compact (primitive, no boxing)
    java.util.Arrays.sort(mins)
    var out = 1
    var j = 1
    while (j < m) {
      if (mins(j) != mins(j - 1)) { mins(out) = mins(j); out += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(mins, out))
  }
}

/** Catalyst expression wrapping [[WinnowKernel]]: `array<bigint>` of the
  * document's distinct winnowing fingerprints, computed inside whole-stage
  * codegen. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DataTypes.StringType && k > 0 && w > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and positive k/w, got " +
        s"${child.dataType.catalogString}, k=$k, w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    WinnowKernel.winnow(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowKernel.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}
