package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid cell ids for every PQ subspace of an `array<float>`
  * vector, in ONE stable-shaped kernel: returns `array<int>` of length `m`
  * (= books.length) where entry j is
  * `argmin_i (‖books(j)(i)‖² − 2·⟨subvec(v,j), books(j)(i)⟩)`,
  * ties to the lower cell id — bit-identical to the literal composition it
  * replaces (`array_min(array(struct(normLit − 2.0·dotFast(slice(v,…),
  * centLit), i)…)).getField("cell")` per subspace; asserted element-wise by
  * SimilaritySpec):
  *
  *  - the norm term is the SAME driver-side Scala double sum
  *    (`c.map(x*x).sum`, left-associated from 0.0) the literal form folded
  *    into `lit(...)`;
  *  - the dot accumulates `(double) vFloat · (double) cFloat` left to right —
  *    [[FloatVectorDot]]'s order — against the float-cast centroid exactly
  *    as `centLit` cast each coordinate;
  *  - `dd = norm − 2.0 · dot` in double, compared with Spark SQL's double
  *    ordering (`-0.0 == 0.0`, NaN greatest — SQLOrderingUtil semantics), so
  *    argmin ties and NaN placement match `array_min`'s struct ordering;
  *  - a subspace whose sub-vector is missing (short array), length-mismatched
  *    (`strictLen`), or null-element'd yields cell 0 — the literal form's
  *    null `dd` sorted FIRST in the struct ordering for every i, so
  *    `array_min` returned cell 0 there too; a null input vector yields all
  *    zeros (every struct had null dd), so the expression is never null.
  *
  * Why it exists (r16 optimization round, guide §"per-task work"/codegen):
  * the literal composition inlines m·k·sub float literals into the generated
  * source, so every Lloyd training iteration — whose codebook values differ —
  * produces NEW source and pays a janino compilation of a ~100-dot expression
  * (measured: the dominant per-iteration cost of ss6/ss4 at fixture scale).
  * Here the codebook is a runtime reference object (`ctx.addReferenceObj`):
  * the generated source is byte-identical across iterations AND between
  * training and the corpus encode, so the whole-stage codegen cache compiles
  * the kernel once per query shape. Per-row work also drops: the kernel
  * indexes the input array in place instead of allocating a `slice()` copy
  * per subspace (the 100 TB encode-pass hot path).
  *
  * `strictLen`: the IVF (m=1) caller dots the WHOLE vector against 64-wide
  * centroids — a vector of any other length was a dot length-mismatch (null
  * dd → cell 0) in the literal form, so validity there is `n == sub`; the PQ
  * caller sliced, so validity is `n ≥ (j+1)·sub` per subspace.
  */
case class PqArgminCells(
    child: Expression,
    books: Seq[Seq[Seq[Double]]],
    sub: Int,
    strictLen: Boolean)
  extends UnaryExpression {

  private def m: Int = books.length

  // precomputed per-(subspace, cell): float-cast centroids for the dot,
  // driver-side double norms for the distance — the exact values the
  // literal composition embedded
  @transient private lazy val booksF: Array[Array[Array[Float]]] =
    books.map(_.map(_.map(_.toFloat).toArray).toArray).toArray
  @transient private lazy val normsD: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum).toArray).toArray

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if books.nonEmpty && books.forall(_.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires non-empty codebooks")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${t.catalogString}")
  }

  /** Spark SQL double comparison (SQLOrderingUtil): `-0.0 == 0.0`,
    * NaN greater than everything — the ordering `array_min` used. */
  private def sqlLt(x: Double, y: Double): Boolean =
    !(x == y) && java.lang.Double.compare(x, y) < 0

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cells = new Array[Int](m)
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var j = 0
      while (j < m) {
        val base = j * sub
        var bad = if (strictLen) n != sub else base + sub > n
        var t = 0
        while (!bad && t < sub) { if (arr.isNullAt(base + t)) bad = true; t += 1 }
        if (!bad) {
          val bj = booksF(j)
          val nj = normsD(j)
          var bestI = -1
          var best = 0.0
          var i = 0
          while (i < bj.length) {
            val c = bj(i)
            var s = 0.0
            var u = 0
            while (u < sub) {
              s += arr.getFloat(base + u).toDouble * c(u).toDouble
              u += 1
            }
            val dd = nj(i) - 2.0 * s
            if (bestI < 0 || sqlLt(dd, best)) { best = dd; bestI = i }
            i += 1
          }
          cells(j) = bestI
        }
        j += 1
      }
    }
    new GenericArrayData(cells)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val bf = ctx.addReferenceObj("pqBooks", booksF, "float[][][]")
    val nr = ctx.addReferenceObj("pqNorms", normsD, "double[][]")
    val cells = ctx.freshName("cells")
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val j = ctx.freshName("j")
    val base = ctx.freshName("base")
    val bad = ctx.freshName("bad")
    val t = ctx.freshName("t")
    val bj = ctx.freshName("bj")
    val nj = ctx.freshName("nj")
    val bestI = ctx.freshName("bestI")
    val best = ctx.freshName("best")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val s = ctx.freshName("s")
    val u = ctx.freshName("u")
    val dd = ctx.freshName("dd")
    val lenOk = if (strictLen) s"$n == $sub" else s"$base + $sub <= $n"
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        ${childGen.code}
        int[] $cells = new int[$m];
        if (!(${childGen.isNull})) {
          ArrayData $arr = ${childGen.value};
          final int $n = $arr.numElements();
          for (int $j = 0; $j < $m; $j++) {
            final int $base = $j * $sub;
            boolean $bad = !($lenOk);
            for (int $t = 0; !$bad && $t < $sub; $t++) {
              if ($arr.isNullAt($base + $t)) $bad = true;
            }
            if ($bad) continue;
            final float[][] $bj = $bf[$j];
            final double[] $nj = $nr[$j];
            int $bestI = -1;
            double $best = 0.0;
            for (int $i = 0; $i < $bj.length; $i++) {
              final float[] $c = $bj[$i];
              double $s = 0.0;
              for (int $u = 0; $u < $sub; $u++) {
                $s += (double) $arr.getFloat($base + $u) * (double) $c[$u];
              }
              final double $dd = $nj[$i] - 2.0 * $s;
              if ($bestI < 0 ||
                  (!($dd == $best) && java.lang.Double.compare($dd, $best) < 0)) {
                $best = $dd; $bestI = $i;
              }
            }
            $cells[$j] = $bestI;
          }
        }
        ArrayData ${ev.value} = new ${classOf[GenericArrayData].getName}($cells);
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqArgminCells =
    copy(child = newChild)

  override def prettyName: String = "pq_argmin_cells"
}
