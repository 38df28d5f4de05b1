package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression for the vector hot path.
  *
  * `aggregate(zip_with(a, b, *), 0d, +)` is semantically a dot product
  * but executes as an interpreted higher-order-function chain
  * (CodegenFallback + a materialised product array per pair). On an
  * all-pairs similarity join that interpreter overhead dominates the
  * arithmetic ~50:1. This expression generates a tight primitive loop
  * inside whole-stage codegen instead — the preference order SURVEY §4
  * mandates: functions first, custom codegen Expression second, UDF never.
  */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "double_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Symmetric per-vector int8 quantization of an array<double>:
  * scale = max|x|/127 (1.0 for the zero vector), code_i =
  * round(x_i/scale) — the storage form a 100 TB vector corpus actually
  * persists/ships (4x fewer bytes than float32, 8x fewer than the
  * double compute form; per-component error <= scale/2 by
  * construction). Returns struct<codes: binary, scale: double>; one
  * codegen'd call, no UDF, no shuffle. */
case class QuantizeVec(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = VecQuant.schema

  override def prettyName: String = "quantize_vec"

  override def nullSafeEval(input: Any): Any =
    VecQuant.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.VecQuant.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** Inverse of [[QuantizeVec]]: codes x scale -> array<double>. */
case class DequantizeVec(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, double), got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "dequantize_vec"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecQuant.dequantize(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.VecQuant.dequantize($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DequantizeVec =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product of two int8 code vectors (binary columns) — the
  * quantized scoring kernel: one byte multiply-accumulate per
  * dimension inside whole-stage codegen. LONG output: dim x 127^2
  * never overflows. The true dot is byteDot x scaleA x scaleB. */
case class ByteDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary inputs, got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "byte_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ByteDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Static kernels the generated code calls. */
object VecQuant {
  import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("scale", DoubleType, nullable = false)))

  def quantize(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0.0) 1.0 else maxAbs / 127.0
    val codes = new Array[Byte](n)
    i = 0
    while (i < n) {
      codes(i) = math.round(arr.getDouble(i) / scale).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](codes, scale))
  }

  def dequantize(codes: Array[Byte], scale: Double): ArrayData = {
    val out = new Array[Double](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = codes(i) * scale; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Intersection size of two SORTED-ASCENDING, DISTINCT array<long>
  * columns — the set-similarity hot path's twin of [[DoubleDotProduct]].
  *
  * The Jaccard verify pass scores every candidate pair with
  * `size(array_intersect)/size(array_union)`; both built-ins hash one
  * side and MATERIALISE a result array per pair, for a consumer that
  * only reads the size — at sf10 that is 25M+ pairs of pure allocation
  * (the r14 stage profile put verify at ~20 s of the closure tier).
  * On the shingle tables both inputs are sorted and distinct by
  * construction ([[graft.operators.Dedup.shingleHashSets]] sorts its
  * hash sets), so the intersection size is ONE allocation-free merge
  * scan, and |A∪B| = |A|+|B|−|A∩B| by inclusion-exclusion — the verify
  * keeps Spark's own size()/division/round nodes, so its value (and
  * the DuckDB oracle) is unchanged. CONTRACT: both arrays sorted
  * ascending with distinct elements; violating it silently undercounts
  * (exactly like feeding unsorted input to any merge join). A NULL
  * ELEMENT in either array makes the whole result NULL (checked in the
  * merge loop — internal shingle tables never contain one, but a
  * stored table round-trips through parquet as containsNull=true, and
  * a SQL user's null must surface as SQL NULL, never be read by
  * getLong as a silent 0). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs (sorted ascending, " +
          s"distinct), got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) $i++;
         |  else if ($xv > $yv) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Exactly-once emission gate for the LSH bucket self-join — the
  * first-matching-band filter that replaces the pair-report family's
  * global DISTINCT ([[graft.operators.Dedup]] pair feeds).
  *
  * A MinHash pair sharing b bands is re-found b times by the bucket
  * self-join (measured sf10: 626M joined rows collapsing to 27.3M
  * unique pairs — ~23 re-finds each — with the collapse paid as a
  * 47 s pair-volume-sized DISTINCT shuffle). Each joined row carries
  * both docs' per-band bucket arrays plus its own band positions, so
  * whether THIS row is the pair's canonical emission is a local
  * decision and the distinct shuffle is unnecessary. Returns true iff:
  *
  *  - `aBand == bBand` and that band is the FIRST index at which the
  *    two arrays agree positionally (the pair's canonical same-band
  *    emission, exactly one per pair that shares any band); or
  *  - `aBand != bBand`, the arrays agree at NO position, and
  *    `(aBand, bBand)` is the lexicographically-first position pair
  *    with `arrA(i) == arrB(j)`, `i != j` — the ~2⁻³²-rate cross-band
  *    hash-collision rows today's join-on-bucket-value keeps; gating
  *    them on their first witness (rather than a residual distinct)
  *    keeps the output set BIT-IDENTICAL to the distinct form with no
  *    second pass. Rows whose pair also agrees positionally return
  *    false here — that pair's canonical emission is its same-band row.
  *
  * Cost: the same-band arm scans to the first positional agreement
  * (≤ bands comparisons, usually far fewer); the quadratic cross-band
  * arm runs only on rows with no positional agreement — for real band
  * hashes, a handful per billion. Codegen'd so the 626M-row hot path
  * stays inside the join's WholeStageCodegen span. */
case class FirstMatchingBand(first: Expression, second: Expression,
                             third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _),
            IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<int>, int, int), got " +
          s"${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)}, ${d.simpleString(10)}")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "first_matching_band"

  /** Array elements may be NULL: the governed (capped) feed NULLs a
    * doc's capped-out bands in the rebuilt arrays so the gate never
    * matches them — a null position agrees with nothing (not even
    * another null). The full feed's arrays carry no nulls, and the
    * guards cost one bitset probe per compared position. */
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val aBand = c.asInstanceOf[Int]
    val bBand = d.asInstanceOf[Int]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getInt(i) == y.getInt(i)) {
        // first positional agreement decides: canonical iff it is this
        // row's (same-band) position
        return aBand == bBand && i == aBand
      }
      i += 1
    }
    if (aBand == bBand) return false // no positional agreement at all
    // cross-band arm: lexicographically-first (i, j) with x(i) == y(j)
    val na = x.numElements(); val nb = y.numElements()
    i = 0
    while (i < na) {
      if (!x.isNullAt(i)) {
        var j = 0
        while (j < nb) {
          if (i != j && !y.isNullAt(j) && x.getInt(i) == y.getInt(j))
            return i == aBand && j == bBand
          j += 1
        }
      }
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val pos = ctx.freshName("pos")
      val outer = ctx.freshName("outer")
      s"""
         |${ev.value} = false;
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $n = java.lang.Math.min($na, $nb);
         |int $pos = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getInt($i) == $b.getInt($i)) { $pos = $i; break; }
         |}
         |if ($pos >= 0) {
         |  ${ev.value} = ($c == $d && $pos == $c);
         |} else if ($c != $d) {
         |  $outer:
         |  for (int $i = 0; $i < $na; $i++) {
         |    if ($a.isNullAt($i)) continue;
         |    for (int $j = 0; $j < $nb; $j++) {
         |      if ($i != $j && !$b.isNullAt($j) && $a.getInt($i) == $b.getInt($j)) {
         |        ${ev.value} = ($i == $c && $j == $d);
         |        break $outer;
         |      }
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): FirstMatchingBand =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

/** 63-bit SimHash of a shingle-hash array as ONE expression — the
  * per-bit majority vote is a pure per-document function of the doc's
  * own (distinct) shingle hashes, so computing it as 63 conditional SUM
  * aggregates over the EXPLODED shingle relation (the pre-r19 shape)
  * paid an explode of every shingle row plus a 63-column aggregation
  * exchange for what one array pass produces in place. Semantics
  * replicated exactly: vote over bits 0..62 of each element (+1 set,
  * -1 clear), bit set in the result when its vote is >= 0 (ties set,
  * matching the aggregate form's `bit_b >= 0`). Callers must filter
  * empty shingle sets first — the aggregate form DROPPED such docs (no
  * exploded rows), while an expression row would survive. */
case class Simhash64(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<long> input, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    VectorExpressions.simhashEval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VectorExpressions.simhashEval($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** Nearest-centroid scoring of one vector against the WHOLE (tiny,
  * label-sorted) centroid matrix as one kernel call: struct(pred_idx,
  * pred_cos, margin). The composed form evaluated L separate
  * `round(dot(cast(v), lit(c_l)) / (norm * cn), 6)` expression trees —
  * each appearing again inside `greatest`, the tie-breaking coalesce
  * chain AND the margin's array_sort, with the array<float>→
  * array<double> cast re-materialised per appearance. Semantics
  * replicated exactly (spec-pinned in DedupSimilaritySpec):
  *  - cosines in ascending-label order, each rounded with Spark
  *    `round(_, 6)` double semantics (BigDecimal.valueOf + HALF_UP);
  *  - zero centroid norm or zero vector norm scores 0.0;
  *  - pred_idx = FIRST index attaining the max (ascending label order
  *    == smaller label wins ties, the oracle's ORDER BY cos DESC,
  *    label);
  *  - margin = round(max − second-max, 6) over the rounded cosines
  *    (duplicates kept, so a two-way tie at the top gives 0.0); null
  *    when there is only one centroid. */
case class CentroidScores(child: Expression,
                          mat: Array[Array[Double]],
                          norms: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(mat.nonEmpty && mat.length == norms.length,
    "centroid matrix and norms must be non-empty and aligned")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(org.apache.spark.sql.types.FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${t.simpleString(10)}")
  }

  private val floatInput: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = CentroidScores.schema

  override def prettyName: String = "centroid_scores"

  override def nullSafeEval(input: Any): Any =
    VectorExpressions.centroidScores(
      input.asInstanceOf[ArrayData], floatInput, mat, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centMat", mat, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VectorExpressions.centroidScores($c, $floatInput, $matRef, $normsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidScores =
    copy(child = newChild)
}

object CentroidScores {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("pred_idx", IntegerType, nullable = false),
    StructField("pred_cos", DoubleType, nullable = false),
    StructField("margin", DoubleType, nullable = true)))
}

object VectorExpressions {

  /** Spark `round(x, 6)` double semantics. */
  @inline private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def centroidScores(arr: ArrayData, floatInput: Boolean,
                     mat: Array[Array[Double]],
                     norms: Array[Double]): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    if (floatInput) while (i < n) { v(i) = arr.getFloat(i); i += 1 }
    else while (i < n) { v(i) = arr.getDouble(i); i += 1 }
    var vv = 0.0
    i = 0
    while (i < n) { vv += v(i) * v(i); i += 1 }
    val vnorm = math.sqrt(vv)
    val L = mat.length
    var best = Double.NegativeInfinity
    var second = Double.NegativeInfinity
    var bestIdx = 0
    var l = 0
    while (l < L) {
      val c = mat(l)
      val cos =
        if (norms(l) == 0.0 || vnorm == 0.0) 0.0
        else {
          val d = math.min(n, c.length)
          var s = 0.0
          var j = 0
          while (j < d) { s += v(j) * c(j); j += 1 }
          round6(s / (vnorm * norms(l)))
        }
      if (cos > best) { second = best; best = cos; bestIdx = l }
      else if (cos > second) second = cos
      l += 1
    }
    val margin: Any = if (L < 2) null else round6(best - second)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestIdx, best, margin))
  }

  /** Column-API surface for [[CentroidScores]]. */
  def centroidScores(c: Column, mat: Array[Array[Double]],
                     norms: Array[Double]): Column =
    CatalystBridge.column(CentroidScores(CatalystBridge.expression(c), mat, norms))

  def simhashEval(arr: ArrayData): Long = {
    val votes = new Array[Int](63)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 63) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 63) {
      if (votes(b) >= 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Column-API surface for [[Simhash64]]. */
  def simhash(c: Column): Column =
    CatalystBridge.column(Simhash64(CatalystBridge.expression(c)))

  /** Column-API surface for [[DoubleDotProduct]]. Inputs must already be
    * array<double> (cast with [[graft.functions.vecD]]). */
  def dotD(a: Column, b: Column): Column =
    CatalystBridge.column(DoubleDotProduct(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Column-API surface for [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    CatalystBridge.column(SortedIntersectCount(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Column-API surface for [[FirstMatchingBand]]. */
  def firstMatchingBand(aArr: Column, bArr: Column,
                        aBand: Column, bBand: Column): Column =
    CatalystBridge.column(FirstMatchingBand(
      CatalystBridge.expression(aArr), CatalystBridge.expression(bArr),
      CatalystBridge.expression(aBand), CatalystBridge.expression(bBand)))

  /** Column-API surface for [[QuantizeVec]] — struct(codes, scale). */
  def quantizeVec(a: Column): Column =
    CatalystBridge.column(QuantizeVec(CatalystBridge.expression(a)))

  /** Column-API surface for [[DequantizeVec]]. */
  def dequantizeVec(codes: Column, scale: Column): Column =
    CatalystBridge.column(DequantizeVec(
      CatalystBridge.expression(codes), CatalystBridge.expression(scale)))

  /** Column-API surface for [[ByteDotProduct]]. */
  def dotBytes(a: Column, b: Column): Column =
    CatalystBridge.column(ByteDotProduct(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
