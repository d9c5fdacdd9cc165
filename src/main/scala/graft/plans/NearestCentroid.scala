package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: index of the nearest centroid (by cosine)
  * among a CONSTANT centroid matrix, with whole-stage codegen.
  *
  * Why (SURVEY.md §7.3 preference order (b)): the composed formulation —
  * `greatest(struct(cosine(vec, c0), -0), struct(cosine(vec, c1), -1), …)`
  * — builds one struct per centroid per row and re-walks the input vector
  * `2 × nlist` times (dot + norm each); past ~16 centroids the expression
  * tree also grows beyond what Janino compiles comfortably. This kernel
  * computes the row norm ONCE, caches centroid norms at plan build, and
  * argmaxes in a single fused loop — the per-row cost drops from
  * O(nlist·dim) heavyweight expression nodes to one tight primitive loop.
  *
  * Bit-parity with the composed form (and so with the q17/q67 DuckDB
  * oracles): per-centroid cosine uses the exact CosineSimilarity
  * accumulation (ascending-index double sums, dot over the shorter
  * prefix, `sqrt(na) * sqrt(nb)` denominator, 0.0 on zero norms —
  * caching `sqrt(nb)` per centroid is value-identical), and ties keep
  * the SMALLEST centroid index (strict `>` while scanning ascending),
  * matching `greatest`'s max-of-negated-id tiebreak.
  *
  * The right child must be a foldable `array<array<float>>` (centroid
  * literals); it is materialized once per task, never per row.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "centroid matrix must be foldable (literal centroids)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  /** (matrix, per-centroid sqrt-norms), materialized once. */
  @transient private lazy val cents: (Array[Array[Float]], Array[Double]) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val m = Array.tabulate(arr.numElements()) { c =>
      val row = arr.getArray(c)
      Array.tabulate(row.numElements())(row.getFloat)
    }
    val norms = m.map { row =>
      var nb = 0.0; var i = 0
      while (i < row.length) { val v = row(i).toDouble; nb += v * v; i += 1 }
      math.sqrt(nb)
    }
    (m, norms)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val (m, norms) = cents
    val nx = x.numElements()
    var na = 0.0
    var i = 0
    while (i < nx) { val v = x.getFloat(i).toDouble; na += v * v; i += 1 }
    val sna = math.sqrt(na)
    var best = -1
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < m.length) {
      val row = m(c)
      val n = math.min(nx, row.length)
      var dot = 0.0
      i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * row(i).toDouble; i += 1 }
      val denom = sna * norms(c)
      val cos = if (denom > 0.0) dot / denom else 0.0
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centMatrix", cents._1, "float[][]")
    val norms = ctx.addReferenceObj("centNorms", cents._2, "double[]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val sna = ctx.freshName("sna")
      val v = ctx.freshName("v")
      val dot = ctx.freshName("dot")
      val denom = ctx.freshName("denom")
      val cos = ctx.freshName("cos")
      val best = ctx.freshName("best")
      val bestCos = ctx.freshName("bestCos")
      val row = ctx.freshName("row")
      s"""
         |double $na = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.getFloat($i); $na += $v * $v;
         |}
         |double $sna = java.lang.Math.sqrt($na);
         |int $best = -1; double $bestCos = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $m.length; $c++) {
         |  float[] $row = $m[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $row.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * ((double) $row[$i]);
         |  }
         |  double $denom = $sna * $norms[$c];
         |  double $cos = $denom > 0.0 ? $dot / $denom : 0.0;
         |  if ($cos > $bestCos) { $bestCos = $cos; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
