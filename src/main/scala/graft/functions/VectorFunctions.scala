package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Dot product of two float-vector columns, accumulated left-to-right in
  * doubles — a codegen'd Catalyst expression (SURVEY §4 custom item #2).
  *
  * The built-in route (`aggregate(zip_with(...))`) allocates an
  * intermediate array and interprets the lambdas per row; this compiles to
  * a tight fused loop inside whole-stage codegen. The fold order is
  * identical to the HOF version and to the oracle's explicit term chain,
  * so results stay bit-for-bit comparable.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer twin of [[VecDot]] for quantized vectors (array<bigint>):
  * exact long accumulation, fused loop inside whole-stage codegen. The
  * interpreted `aggregate(zip_with(...))` HOF route would break the WSCG
  * span around the ANN candidate scoring loop.
  */
case class VecDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment as a single codegen'd map expression: the
  * (small, driver-collected) centroid matrix rides inside the expression
  * — one `double[][]` reference object in the generated class, shipped
  * once per task via the task binary — and each input row runs a fused
  * argmin loop. This replaces the crossJoin(corpus × centroids) +
  * per-vector min-aggregation plan, whose n·cells intermediate rows each
  * carried the full embedding array through an exchange: at cells ≈ √n
  * that materialization is n^1.5 rows of ~KB width, and the 10×
  * scale probe measured it at 18–27× wall growth. As a map expression,
  * assignment costs the inherent n·cells·dim flops, zero shuffle, zero
  * row explosion.
  *
  * Arithmetic is pinned to the DuckDB oracles: the dot accumulates
  * index-ascending in doubles (identical to [[VecDot]] and the SQL term
  * chain), each |c|² is pre-accumulated in the same order, and
  * `dist = (|v|² + |c|²) − 2·v·c` associates exactly like the SQL
  * `v.nrm + s.nrm - 2 * (...)`. Equal distances keep the LOWEST cluster
  * id (centroids are scanned in ascending id order with a strict `<`),
  * matching `ORDER BY dist_sq, cluster`.
  *
  * Children: (embedding: array<float>, nrm: double). Returns
  * struct(cluster: long, dist_sq: double).
  */
case class VecNearestCell(left: Expression, right: Expression,
    ids: Array[Long], cents: Array[Array[Double]])
    extends BinaryExpression {

  require(ids.nonEmpty && ids.length == cents.length,
    s"need a non-empty centroid set, got ${ids.length} ids / ${cents.length} centroids")
  require((1 until ids.length).forall(i => ids(i - 1) < ids(i)),
    "centroid ids must be strictly ascending (ties keep the lowest id)")

  private val cnorms: Array[Double] = cents.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    acc
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("dist_sq", DoubleType, nullable = false)))
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "vec_nearest_cell"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    var bestId = ids(0); var bestDist = Double.PositiveInfinity
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(x.numElements(), c.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * c(i); i += 1 }
      val dist = (nrm + cnorms(j)) - 2.0 * acc
      if (dist < bestDist) { bestDist = dist; bestId = ids(j) }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestId, bestDist))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mat = ctx.addReferenceObj("cellMatrix", cents, "double[][]")
      val nrms = ctx.addReferenceObj("cellNorms", cnorms, "double[]")
      val cid = ctx.addReferenceObj("cellIds", ids, "long[]")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val dist = ctx.freshName("dist")
      val bestId = ctx.freshName("bestId"); val bestDist = ctx.freshName("bestDist")
      s"""
         |long $bestId = $cid[0];
         |double $bestDist = Double.POSITIVE_INFINITY;
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  double[] $c = $mat[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $c.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * $c[$i];
         |  }
         |  double $dist = ($b + $nrms[$j]) - 2.0 * $acc;
         |  if ($dist < $bestDist) { $bestDist = $dist; $bestId = $cid[$j]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{java.lang.Long.valueOf($bestId), java.lang.Double.valueOf($bestDist)});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoding as a single codegen'd map expression:
  * the (tiny, driver-collected) per-subspace codebooks ride inside the
  * expression, and each input vector emits its `subs` nearest-codeword
  * ids in one fused pass — replacing the explode(n×subs) × broadcast
  * codebook join (n·subs·codes intermediate rows) + per-(vector,
  * subspace) min-aggregation shuffle that the 10× scale probe measured
  * as the PQ family's dominant cost. Same arithmetic contract as
  * [[VecNearestCell]]: per-dimension `(e_i − c_i)²` accumulated
  * index-ascending in doubles (the oracle's term chain), codewords
  * scanned in ascending code order with strict `<` so ties keep the
  * lowest code id.
  *
  * Child: embedding (array<float>). `codes(m)(j)` / `cws(m)(j)` are the
  * j-th codeword id / vector of subspace m; subspace m reads embedding
  * components `[m·subDim, (m+1)·subDim)`. Returns array<long> of length
  * `subs` — the code per subspace, positionally.
  */
case class VecPqEncode(child: Expression,
    codes: Array[Array[Long]], cws: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codes.nonEmpty && codes.length == cws.length,
    s"need per-subspace codebooks, got ${codes.length}/${cws.length}")
  require(codes.indices.forall(m => codes(m).nonEmpty &&
    codes(m).length == cws(m).length), "empty or misaligned subspace codebook")
  require(codes.forall(cs => (1 until cs.length).forall(i => cs(i - 1) < cs(i))),
    "codeword ids must be strictly ascending per subspace (ties keep the lowest)")

  private val subDim: Int = cws(0)(0).length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "vec_pq_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Long](codes.length)
    var m = 0
    while (m < codes.length) {
      val off = m * subDim
      var bestCode = codes(m)(0); var bestDist = Double.PositiveInfinity
      var j = 0
      while (j < cws(m).length) {
        val c = cws(m)(j)
        var acc = 0.0; var i = 0
        while (i < subDim) {
          val d = x.getFloat(off + i).toDouble - c(i)
          acc += d * d; i += 1
        }
        if (acc < bestDist) { bestDist = acc; bestCode = codes(m)(j) }
        j += 1
      }
      out(m) = bestCode; m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cid = ctx.addReferenceObj("pqCodes", codes, "long[][]")
      val mat = ctx.addReferenceObj("pqCws", cws, "double[][][]")
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val off = ctx.freshName("off"); val out = ctx.freshName("out")
      val bestCode = ctx.freshName("bestCode")
      val bestDist = ctx.freshName("bestDist")
      s"""
         |long[] $out = new long[$cid.length];
         |for (int $m = 0; $m < $cid.length; $m++) {
         |  int $off = $m * $subDim;
         |  long $bestCode = $cid[$m][0];
         |  double $bestDist = Double.POSITIVE_INFINITY;
         |  for (int $j = 0; $j < $mat[$m].length; $j++) {
         |    double[] $c = $mat[$m][$j];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $d = (double) $a.getFloat($off + $i) - $c[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestDist) { $bestDist = $acc; $bestCode = $cid[$m][$j]; }
         |  }
         |  $out[$m] = $bestCode;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {

  /** Dot product of two array<float> columns as a double. */
  def vec_dot(a: Column, b: Column): Column =
    bridge.column(VecDot(bridge.expression(a), bridge.expression(b)))

  /** PQ codes (one per subspace, positionally) of an array<float> column
    * against fixed per-subspace codebooks — see [[VecPqEncode]].
    * `bySub(m)` = (ascending codeword ids, codeword vectors) of
    * subspace m. */
  def vec_pq_encode(e: Column,
      bySub: Seq[(Array[Long], Array[Array[Double]])]): Column =
    bridge.column(VecPqEncode(bridge.expression(e),
      bySub.map(_._1).toArray, bySub.map(_._2).toArray))

  /** Nearest centroid of an array<float> column against a fixed centroid
    * matrix, as struct(cluster, dist_sq) — see [[VecNearestCell]]. */
  def vec_nearest_cell(e: Column, nrm: Column,
      cents: Seq[(Long, Array[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    bridge.column(VecNearestCell(bridge.expression(e), bridge.expression(nrm),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray))
  }

  /** Exact dot product of two array<bigint> columns as a long. */
  def vec_dot_long(a: Column, b: Column): Column =
    bridge.column(VecDotLong(bridge.expression(a), bridge.expression(b)))

  /** Squared L2 norm of an array<float> column. */
  def vec_norm2(a: Column): Column = vec_dot(a, a)

  /** Register SQL names (idempotent per session). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_long", exprs => VecDotLong(exprs(0), exprs(1)), "scala_udf")
  }
}
