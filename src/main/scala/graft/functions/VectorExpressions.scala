package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused, whole-stage-codegen distance kernels (SURVEY.md §7.7 — the
  * perf track behind the F1-F3 Column compositions).
  *
  * The `zip_with`/`aggregate` higher-order compositions in
  * VectorFunctions are semantically exact but evaluate INTERPRETED
  * (Catalyst does not codegen lambda functions), boxing every element.
  * These expressions emit a tight primitive loop via doGenCode instead —
  * same float32-input / float64-accumulation contract, same
  * left-to-right fold order, bit-identical results (each accumulator is
  * independent, so fusing the three cosine folds into one loop cannot
  * change any IEEE result) — the oracle SQL is unchanged.
  *
  * Kernels (reference: vector_db/indexes.py:108-123):
  *   cosine   = 1 - v.q/(|v||q|), +Inf when either norm is 0
  *   euclidean = sqrt(sum (v_i - q_i)^2)
  *   dot      = -(v.q)
  */
abstract class VectorDistanceExpression extends BinaryExpression
  with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DoubleType

  /** Scala twin of the generated loop (interpreted eval path). */
  protected def compute(a: ArrayData, b: ArrayData): Double

  /** Java loop body: given array variables, assign the result double to
    * `resultVar`. Locals MUST come from `ctx.freshName` — two kernels in
    * the same whole-stage-codegen function otherwise collide on variable
    * names, and the janino "Redefinition of local variable" error silently
    * drops the ENTIRE stage to interpreted mode. */
  protected def genLoop(ctx: CodegenContext, a: String, b: String,
                        resultVar: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      // mirror nullSafeEval: mismatched dimensions raise, never silently
      // truncate (reference _normalize_vector errors on mismatch) — via the
      // registered SQL functions there is no engine-level dim guard ahead
      // of this kernel.
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch (" + $a.numElements() +
         |    " vs " + $b.numElements() + ")");
         |}
         |""".stripMargin + genLoop(ctx, a, b, ev.value))
}

/** v · q accumulated in double (float32 inputs). */
case class DotProductExpr(left: Expression, right: Expression)
  extends VectorDistanceExpression {

  override def prettyName: String = "vec_dot"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 res: String): String = {
    val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
       |}
       |$res = $acc;
       |""".stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
  : Expression = copy(left = l, right = r)
}

/** 1 - v.q/(|v||q|); +Infinity when either norm is zero
  * (vector_db/indexes.py:112-113). One fused loop for all three folds. */
case class CosineDistanceExpr(left: Expression, right: Expression)
  extends VectorDistanceExpression {

  override def prettyName: String = "cosine_distance"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val d1 = math.sqrt(na); val d2 = math.sqrt(nb)
    if (d1 == 0.0d || d2 == 0.0d) Double.PositiveInfinity
    else 1.0d - dot / (d1 * d2)
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 res: String): String = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    val d1 = ctx.freshName("d1"); val d2 = ctx.freshName("d2")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = (double) $a.getFloat($i);
       |  double $y = (double) $b.getFloat($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |double $d1 = java.lang.Math.sqrt($na);
       |double $d2 = java.lang.Math.sqrt($nb);
       |$res = ($d1 == 0.0 || $d2 == 0.0)
       |  ? Double.POSITIVE_INFINITY : 1.0 - $dot / ($d1 * $d2);
       |""".stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
  : Expression = copy(left = l, right = r)
}

/** sqrt(sum (v_i - q_i)^2) (vector_db/indexes.py:117-119). */
case class EuclideanDistanceExpr(left: Expression, right: Expression)
  extends VectorDistanceExpression {

  override def prettyName: String = "euclidean_distance"

  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }

  override protected def genLoop(ctx: CodegenContext, a: String, b: String,
                                 res: String): String = {
    val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
    val i = ctx.freshName("i"); val d = ctx.freshName("d")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
       |  $acc += $d * $d;
       |}
       |$res = java.lang.Math.sqrt($acc);
       |""".stripMargin
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
  : Expression = copy(left = l, right = r)
}

/** Sign-bit LSH bucket hash as a fused loop (twin of
  * VectorFunctions.lshBucket: bit i set iff P_i . v >= 0, double
  * accumulation in matrix-row-major order). The matrix rides inside the
  * expression as ONE reference object (tiny — numProjections x dim
  * doubles), so the plan carries O(1) expression nodes regardless of
  * matrix size and the loop stays inside whole-stage codegen. */
case class LshBucketExpr(child: Expression, matrix: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(matrix.nonEmpty && matrix.length <= 62,
    s"numProjections must be in [1, 62], got ${matrix.length}")

  override def prettyName: String = "lsh_bucket"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != matrix(0).length)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${v.numElements()} vs ${matrix(0).length})")
    var bucket = 0L
    var i = 0
    while (i < matrix.length) {
      val row = matrix(i)
      var acc = 0.0d; var j = 0
      while (j < row.length) { acc += v.getFloat(j).toDouble * row(j); j += 1 }
      if (acc >= 0.0d) bucket |= 1L << i
      i += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("lshMatrix", matrix, "double[][]")
      val bucket = ctx.freshName("bucket"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      s"""
         |if ($v.numElements() != $m[0].length) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch (" + $v.numElements() +
         |    " vs " + $m[0].length + ")");
         |}
         |long $bucket = 0L;
         |for (int $i = 0; $i < $m.length; $i++) {
         |  double[] $row = $m[$i];
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $row.length; $j++) {
         |    $acc += (double) $v.getFloat($j) * $row[$j];
         |  }
         |  if ($acc >= 0.0) $bucket |= 1L << $i;
         |}
         |${ev.value} = $bucket;
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** IVF cell assignment: id of the nearest centroid by euclidean distance,
  * ties broken by the SMALLEST centroid id (ids must be passed sorted
  * ascending; keep-first-on-tie then equals min-id, matching a SQL
  * `row_number() OVER (ORDER BY distance, cid)` oracle).
  *
  * The centroid table rides inside the expression as ONE reference object
  * — at realistic C (4k-64k centroids) this is a few MB serialized once
  * per task, while the per-centroid `least(struct(...))` alternative is
  * O(C * dim) expression NODES, which breaks codegen method-size limits
  * and bloats every serialized plan (the round-2 design defect this
  * replaces). Distance uses the same left-to-right double accumulation +
  * sqrt as EuclideanDistanceExpr so any SQL oracle reproduces ties
  * bit-for-bit. */
case class NearestCellExpr(child: Expression, ids: Array[Long],
                           centroids: Array[Array[Float]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty && ids.length == centroids.length,
    "need >= 1 centroid and one id per centroid")
  require(ids.toSeq == ids.toSeq.sorted, "centroid ids must be sorted ascending")

  override def prettyName: String = "nearest_cell"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != centroids(0).length)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${v.numElements()} vs ${centroids(0).length})")
    var best = Double.PositiveInfinity
    var bestId = ids(0)
    var c = 0
    while (c < centroids.length) {
      val row = centroids(c)
      var acc = 0.0d; var j = 0
      while (j < row.length) {
        val d = v.getFloat(j).toDouble - row(j).toDouble
        acc += d * d; j += 1
      }
      val dist = math.sqrt(acc)
      if (dist < best) { best = dist; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cents = ctx.addReferenceObj("ivfCentroids", centroids, "float[][]")
      val cid = ctx.addReferenceObj("ivfCellIds", ids, "long[]")
      val best = ctx.freshName("best"); val bestId = ctx.freshName("bestId")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val row = ctx.freshName("row"); val dist = ctx.freshName("dist")
      s"""
         |if ($v.numElements() != $cents[0].length) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch (" + $v.numElements() +
         |    " vs " + $cents[0].length + ")");
         |}
         |double $best = Double.POSITIVE_INFINITY;
         |long $bestId = $cid[0];
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  float[] $row = $cents[$c];
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $row.length; $j++) {
         |    double $d = (double) $v.getFloat($j) - (double) $row[$j];
         |    $acc += $d * $d;
         |  }
         |  double $dist = java.lang.Math.sqrt($acc);
         |  if ($dist < $best) { $best = $dist; $bestId = $cid[$c]; }
         |}
         |${ev.value} = $bestId;
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** IVFPQ residual: `float32(v - centroid(cell))` — the vector each PQ
  * codebook actually quantizes under residual encoding (classic IVFADC;
  * Jégou et al. TPAMI 2011 §IV): codebooks span only cell-local variance,
  * which recovers substantially more recall at identical M/K than
  * encoding raw vectors.
  *
  * The subtraction runs in double (exact on float inputs) and rounds each
  * element back to float32 — `((v[i] - cv[i])::FLOAT)` in a SQL oracle,
  * `(v(i).toDouble - c(i).toDouble).toFloat` in the driver twin — so all
  * three engines agree bit-for-bit on the array the per-subspace argmin
  * then sees. The centroid table rides as ONE reference object (like
  * NearestCellExpr); the cell id resolves by binary search over the
  * sorted id array, so arbitrary (non-contiguous) centroid ids work. An
  * unknown cell id throws — stored cells always come from this model, so
  * a miss is corrupt state, not data. */
case class CellResidualExpr(left: Expression, right: Expression,
                            ids: Array[Long], centroids: Array[Array[Float]])
  extends BinaryExpression {

  require(centroids.nonEmpty && ids.length == centroids.length,
    "need >= 1 centroid and one id per centroid")
  require(ids.toSeq == ids.toSeq.sorted, "centroid ids must be sorted ascending")

  override def prettyName: String = "cell_residual"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), org.apache.spark.sql.types.LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, bigint), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(emb: Any, cell: Any): Any = {
    val v = emb.asInstanceOf[ArrayData]
    val idx = java.util.Arrays.binarySearch(ids, cell.asInstanceOf[Long])
    if (idx < 0)
      throw new IllegalArgumentException(
        s"$prettyName: unknown cell id $cell")
    val c = centroids(idx)
    if (v.numElements() != c.length)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${v.numElements()} vs ${c.length})")
    val out = new Array[Float](c.length)
    var i = 0
    while (i < c.length) {
      out(i) = (v.getFloat(i).toDouble - c(i).toDouble).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val cents = ctx.addReferenceObj("residCentroids", centroids, "float[][]")
      val cid = ctx.addReferenceObj("residCellIds", ids, "long[]")
      val idx = ctx.freshName("idx"); val row = ctx.freshName("row")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      s"""
         |int $idx = java.util.Arrays.binarySearch($cid, $cell);
         |if ($idx < 0) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: unknown cell id " + $cell);
         |}
         |float[] $row = $cents[$idx];
         |if ($v.numElements() != $row.length) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch (" + $v.numElements() +
         |    " vs " + $row.length + ")");
         |}
         |float[] $out = new float[$row.length];
         |for (int $i = 0; $i < $row.length; $i++) {
         |  $out[$i] = (float) ((double) $v.getFloat($i) - (double) $row[$i]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared fold bodies for the SQ8 asymmetric distance kernels: the
  * approximate phase scores the library METRIC over the DECODED vector
  * (`dec_i = mn + (code_i * (mx - mn)) / 255.0` — exactly the expression
  * an SQL oracle writes), so every metric the engine supports gets the
  * compact-scan path and the approximate distances (and therefore the
  * candidate SET a rescore pass sees) stay reproducible bit-for-bit.
  *
  * The cosine fold keeps THREE independent accumulators in one loop
  * (mirroring CosineDistanceExpr — fusing independent IEEE folds cannot
  * change any result vs three separate SQL sums); codes are
  * metric-independent, so a library's stored representation never needs
  * re-encoding when its metric differs or changes. */
private[functions] object Sq8Fold {
  val Metrics: Set[String] = Set("euclidean", "cosine", "dot_product")

  /** Interpreted twin: fold metric over (decoded codes, query-element fn). */
  def compute(metric: String, codes: ArrayData, mn: Double, scale: Double,
              q: Int => Double): Double = {
    val n = codes.numElements()
    metric match {
      case "euclidean" =>
        var acc = 0.0d; var i = 0
        while (i < n) {
          val dec = mn + (codes.getInt(i).toDouble * scale) / 255.0
          val d = q(i) - dec
          acc += d * d; i += 1
        }
        math.sqrt(acc)
      case "dot_product" =>
        var acc = 0.0d; var i = 0
        while (i < n) {
          val dec = mn + (codes.getInt(i).toDouble * scale) / 255.0
          acc += dec * q(i); i += 1
        }
        -acc
      case _ => // cosine
        var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
        while (i < n) {
          val dec = mn + (codes.getInt(i).toDouble * scale) / 255.0
          val y = q(i)
          dot += dec * y; na += dec * dec; nb += y * y; i += 1
        }
        val d1 = math.sqrt(na); val d2 = math.sqrt(nb)
        if (d1 == 0.0d || d2 == 0.0d) Double.PositiveInfinity
        else 1.0d - dot / (d1 * d2)
    }
  }

  /** Java loop body: `qElem(i)` is the Java expression for query element i
    * as a double; assigns the metric result to `res`. */
  def genLoop(ctx: CodegenContext, metric: String, codes: String, n: String,
              mn: String, scale: String, qElem: String => String,
              res: String): String = {
    val i = ctx.freshName("i"); val dec = ctx.freshName("dec")
    metric match {
      case "euclidean" =>
        val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
        s"""
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $dec = $mn + ((double) $codes.getInt($i) * $scale) / 255.0;
           |  double $d = ${qElem(i)} - $dec;
           |  $acc += $d * $d;
           |}
           |$res = java.lang.Math.sqrt($acc);
           |""".stripMargin
      case "dot_product" =>
        val acc = ctx.freshName("acc")
        s"""
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $dec = $mn + ((double) $codes.getInt($i) * $scale) / 255.0;
           |  $acc += $dec * ${qElem(i)};
           |}
           |$res = -$acc;
           |""".stripMargin
      case _ => // cosine
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb"); val y = ctx.freshName("y")
        val d1 = ctx.freshName("d1"); val d2 = ctx.freshName("d2")
        s"""
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $dec = $mn + ((double) $codes.getInt($i) * $scale) / 255.0;
           |  double $y = ${qElem(i)};
           |  $dot += $dec * $y; $na += $dec * $dec; $nb += $y * $y;
           |}
           |double $d1 = java.lang.Math.sqrt($na);
           |double $d2 = java.lang.Math.sqrt($nb);
           |$res = ($d1 == 0.0 || $d2 == 0.0)
           |  ? Double.POSITIVE_INFINITY : 1.0 - $dot / ($d1 * $d2);
           |""".stripMargin
    }
  }
}

/** SQ8 asymmetric distance: decode-and-accumulate in ONE fused loop —
  * query (float32) vs a scalar-quantized vector (uint8 codes in an int
  * array + per-vector min/max), scored with the library `metric`
  * (Sq8Fold). The query vector rides as ONE reference object (per-query
  * constant); children are the three stored columns. */
case class Sq8DistanceExpr(first: Expression, second: Expression,
                           third: Expression, query: Array[Float],
                           metric: String)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  require(query.nonEmpty, "query must be non-empty")
  require(Sq8Fold.Metrics(metric), s"unknown sq8 metric: $metric")

  override def prettyName: String = s"sq8_$metric"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<int> codes, double min, double max), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    }

  override def nullSafeEval(codesAny: Any, mnAny: Any, mxAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    if (codes.numElements() != query.length)
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${codes.numElements()} vs ${query.length})")
    val mn = mnAny.asInstanceOf[Double]
    val scale = mxAny.asInstanceOf[Double] - mn
    Sq8Fold.compute(metric, codes, mn, scale, i => query(i).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, mn, mx) => {
      val q = ctx.addReferenceObj("sq8Query", query, "float[]")
      val n = ctx.freshName("n"); val scale = ctx.freshName("scale")
      s"""
         |int $n = $codes.numElements();
         |if ($n != $q.length) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch (" + $n + " vs " + $q.length + ")");
         |}
         |double $scale = $mx - $mn;
         |""".stripMargin +
        Sq8Fold.genLoop(ctx, metric, codes, n, mn, scale,
          i => s"(double) $q[$i]", ev.value)
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Batch variant of Sq8DistanceExpr: the query vector is a fourth COLUMN
  * (array<float> — the batch-search qvec joined onto each candidate row)
  * instead of a per-query constant. The loop is the same Sq8Fold body,
  * term for term, so a batch search and Q single searches produce
  * bit-identical approximate distances (ExpressionEquivalenceSpec locks
  * this). */
case class Sq8DistanceBatchExpr(first: Expression, second: Expression,
                                third: Expression, fourth: Expression,
                                metric: String)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  require(Sq8Fold.Metrics(metric), s"unknown sq8 metric: $metric")

  override def prettyName: String = s"sq8_${metric}_batch"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            DoubleType, DoubleType, ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<int> codes, double min, double max, " +
          s"array<float> query), got (${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString}, ${third.dataType.simpleString}, " +
          s"${fourth.dataType.simpleString})")
    }

  override def nullSafeEval(codesAny: Any, mnAny: Any, mxAny: Any,
                            qAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val q = qAny.asInstanceOf[ArrayData]
    if (codes.numElements() != q.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${codes.numElements()} vs ${q.numElements()})")
    val mn = mnAny.asInstanceOf[Double]
    val scale = mxAny.asInstanceOf[Double] - mn
    Sq8Fold.compute(metric, codes, mn, scale, i => q.getFloat(i).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, mn, mx, q) => {
      val n = ctx.freshName("n"); val scale = ctx.freshName("scale")
      s"""
         |int $n = $codes.numElements();
         |if ($n != $q.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch (" + $n + " vs " + $q.numElements() + ")");
         |}
         |double $scale = $mx - $mn;
         |""".stripMargin +
        Sq8Fold.genLoop(ctx, metric, codes, n, mn, scale,
          i => s"(double) $q.getFloat($i)", ev.value)
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression, fo: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = fo)
}

object VectorExpressions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def lshBucket(v: Column, matrix: Array[Array[Double]]): Column =
    c(LshBucketExpr(e(v), matrix))

  def nearestCell(v: Column, ids: Array[Long],
                  centroids: Array[Array[Float]]): Column =
    c(NearestCellExpr(e(v), ids, centroids))

  def cellResidual(v: Column, cell: Column, ids: Array[Long],
                   centroids: Array[Array[Float]]): Column =
    c(CellResidualExpr(e(v), e(cell), ids, centroids))

  // `metric` is required (no default): the kernel scores the LIBRARY
  // metric over the decoded codes — a forgotten argument must not
  // silently fall back to euclidean.
  def sq8Distance(codes: Column, mn: Column, mx: Column,
                  query: Array[Float], metric: String): Column =
    c(Sq8DistanceExpr(e(codes), e(mn), e(mx), query, metric))

  def sq8DistanceBatch(codes: Column, mn: Column, mx: Column,
                       query: Column, metric: String): Column =
    c(Sq8DistanceBatchExpr(e(codes), e(mn), e(mx), e(query), metric))

  def cosineDistance(v: Column, q: Column): Column =
    c(CosineDistanceExpr(e(v), e(q)))
  def euclideanDistance(v: Column, q: Column): Column =
    c(EuclideanDistanceExpr(e(v), e(q)))
  def dotProduct(v: Column, q: Column): Column =
    c(DotProductExpr(e(v), e(q)))
  def dotProductDistance(v: Column, q: Column): Column =
    -dotProduct(v, q)
}
