package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: fused cosine similarity over two
  * `array<double>` columns — dot product and both norms in ONE loop over
  * the vectors, with full whole-stage-codegen support (`doGenCode`).
  *
  * This is the preferred extension path when composition of built-ins
  * isn't tight enough (builder prompt: native `Expression` > UDF): vs
  * the HOF formulation (three `aggregate(zip_with(...))` passes) it does
  * a third of the array traversals, and vs a Scala UDF it avoids ser/de
  * and stays inside codegen. Accumulation order matches the HOF/oracle
  * fold exactly, so results are bitwise identical (PlansSpec asserts
  * equality; `sim_topk_native` hash-matches the same DuckDB oracle as
  * `sim_topk_embeddings`).
  *
  * Defined over the common prefix when lengths differ; NULL in, NULL out.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // inferred Seq[AbstractDataType] — the type itself is private[sql]
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_dot(a array<double>, b array<double>) -> double` — the
  * sequential left-fold dot product alone (the [[CosineSimilarity]]
  * loop minus the norms): bitwise the HOF
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` over equal-length
  * inputs (0.0 seed, identical association), defined over the common
  * prefix when lengths differ, NULL in NULL out. The pair-scale scoring
  * kernel (r17): every brute/ANN/near-dup verify join evaluates one dot
  * per PAIR, and the HOF form pays the interpreted lambda evaluator per
  * element there — this is one codegen'd loop. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_dot_int8(a array<int>, b array<int>) -> bigint` — quantized
  * dot: int multiply then the long widen per element, long adds —
  * bitwise the HOF `aggregate(zip_with(a, b, (x,y) => (x*y).cast(long)),
  * 0L, _ + _)` (quantized components are <= 127, so the int product
  * never overflows); common-prefix / NULL rules as [[DotProduct]]. Also
  * serves as the quantized squared norm via graft_dot_int8(v, v). */
case class DotProductInt8(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.IntegerType),
    ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_dot_int8"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L; var i = 0
    while (i < n) { s += (x.getInt(i) * y.getInt(i)).toLong; i += 1 }
    s
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) ($a.getInt($i) * $b.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_match_count(a array<string>, b array<string>) -> int` —
  * positional equality count over the common prefix: bitwise
  * `size(filter(zip_with(a, b, _ === _), identity))` for equal-length
  * non-null inputs (the MinHash signature estimator's shape). */
case class MatchCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.StringType),
    ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_match_count"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0; var i = 0
    while (i < n) {
      if (x.getUTF8String(i).equals(y.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getUTF8String($i).equals($b.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernels for the one-vector-vs-k-centroids expressions. The
  * per-centroid loop is the EXACT [[CosineSimilarity]] fold (same
  * accumulation order over the common prefix), so `graft_cosine_many`
  * / `graft_cosine_argmax` are bitwise-equal to k separate
  * `graft_cosine` calls — PlansSpec pins it. The point of fusing: the
  * IVF assignment used to build an ARRAY OF k STRUCT EXPRESSIONS
  * (k codegen'd kernels + array_max), which at the auto-scaled
  * k ≈ √n (142 at the sf1 rung) blows generated-code size and
  * compile time — the sf1 rung measured the auto knob LOSING time to
  * that (68 s vs 57 fixed). With the centroid matrix as ONE flattened
  * literal the expression tree is constant-size and k lives in data. */
object GraftVector {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def cosineMany(v: ArrayData, flat: ArrayData, dim: Int): ArrayData = {
    val k = flat.numElements() / dim
    val out = new Array[Double](k)
    // n and the query norm are invariant across centroids — hoisted out
    // of the j loop (k-fold redundant folds in the corpus-scan kernel
    // otherwise, k ≈ √n at the rungs). nx's own fold order is unchanged,
    // and dot/ny still fold per-centroid, so results stay bitwise equal
    // to the unhoisted form (PlansSpec fuzzes this).
    val n = math.min(v.numElements(), dim)
    var nx = 0.0
    var q = 0
    while (q < n) { val xq = v.getDouble(q); nx += xq * xq; q += 1 }
    val snx = math.sqrt(nx)
    var j = 0
    while (j < k) {
      var dot = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = v.getDouble(i); val yi = flat.getDouble(j * dim + i)
        dot += xi * yi; ny += yi * yi
        i += 1
      }
      out(j) = dot / (snx * math.sqrt(ny))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Index of the most-cosine-similar centroid row; ties -> lowest
    * index (the argmax-projection's old struct-max tie rule). */
  def cosineArgmax(v: ArrayData, flat: ArrayData, dim: Int): Int = {
    val k = flat.numElements() / dim
    var best = Double.NegativeInfinity
    var bi = 0
    // same hoist as [[cosineMany]]: n and the query norm do not vary
    // per centroid; bitwise-identical scores (identical fold orders).
    val n = math.min(v.numElements(), dim)
    var nx = 0.0
    var q = 0
    while (q < n) { val xq = v.getDouble(q); nx += xq * xq; q += 1 }
    val snx = math.sqrt(nx)
    var j = 0
    while (j < k) {
      var dot = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = v.getDouble(i); val yi = flat.getDouble(j * dim + i)
        dot += xi * yi; ny += yi * yi
        i += 1
      }
      val s = dot / (snx * math.sqrt(ny))
      if (s > best) { best = s; bi = j }
      j += 1
    }
    bi
  }
}

/** `graft_cosine_many(vec array<double>, flatCentroids array<double>,
  * dim) -> array<double>` — cosine of `vec` against every dim-sized
  * row of the flattened centroid matrix, one fused pass. */
case class CosineMany(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_cosine_many"
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVector.cosineMany(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dim)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.GraftVector.cosineMany($a, $b, $dim);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_cosine_argmax(vec array<double>, flatCentroids array<double>,
  * dim) -> int` — nearest-centroid id in one fused pass (ties ->
  * lowest id). The IVF assignment projection. */
case class CosineArgmax(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_cosine_argmax"
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVector.cosineArgmax(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dim)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.GraftVector.cosineArgmax($a, $b, $dim);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for the native functions — both as a
  * `SparkSessionExtensions` (config
  * `spark.sql.extensions=graft.plans.GraftExtensions`) and as a direct
  * idempotent per-session registration for embedded use. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Literal

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[plans] val descriptors = Seq(
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)): Expression),
    (FunctionIdentifier("graft_cosine_many"),
      new ExpressionInfo(classOf[CosineMany].getName, "graft_cosine_many"),
      (children: Seq[Expression]) => CosineMany(children(0), children(1),
        intLit(children(2), "dim")): Expression),
    (FunctionIdentifier("graft_cosine_argmax"),
      new ExpressionInfo(classOf[CosineArgmax].getName, "graft_cosine_argmax"),
      (children: Seq[Expression]) => CosineArgmax(children(0), children(1),
        intLit(children(2), "dim")): Expression),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1)): Expression),
    (FunctionIdentifier("graft_dot_int8"),
      new ExpressionInfo(classOf[DotProductInt8].getName, "graft_dot_int8"),
      (children: Seq[Expression]) => DotProductInt8(children(0), children(1)): Expression),
    (FunctionIdentifier("graft_match_count"),
      new ExpressionInfo(classOf[MatchCount].getName, "graft_match_count"),
      (children: Seq[Expression]) => MatchCount(children(0), children(1)): Expression),
    (FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[IntersectCount].getName, "graft_intersect_count"),
      (children: Seq[Expression]) => IntersectCount(children(0), children(1)): Expression),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinHashSignature(children(0),
        intLit(children(1), "nShingle"), intLit(children(2), "numHashes")): Expression),
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children(0),
        intLit(children(1), "n")): Expression),
    (FunctionIdentifier("graft_minhash_hashes"),
      new ExpressionInfo(classOf[MinHashFromHashes].getName, "graft_minhash_hashes"),
      (children: Seq[Expression]) => MinHashFromHashes(children(0),
        intLit(children(1), "numHashes")): Expression),
    (FunctionIdentifier("graft_shingle_strings"),
      new ExpressionInfo(classOf[ShingleStrings].getName, "graft_shingle_strings"),
      (children: Seq[Expression]) => ShingleStrings(children(0),
        intLit(children(1), "n")): Expression),
    (FunctionIdentifier("graft_span_strings"),
      new ExpressionInfo(classOf[SpanStrings].getName, "graft_span_strings"),
      (children: Seq[Expression]) => SpanStrings(children(0),
        intLit(children(1), "w")): Expression),
    (FunctionIdentifier("graft_span_hashes"),
      new ExpressionInfo(classOf[SpanHashes].getName, "graft_span_hashes"),
      (children: Seq[Expression]) => SpanHashes(children(0),
        intLit(children(1), "w")): Expression),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash64(children(0)): Expression),
    (FunctionIdentifier("graft_simhash_wide"),
      new ExpressionInfo(classOf[SimHashWide].getName, "graft_simhash_wide"),
      (children: Seq[Expression]) => SimHashWide(children(0),
        intLit(children(1), "words")): Expression),
    (FunctionIdentifier("graft_lsh_bits"),
      new ExpressionInfo(classOf[LshBits].getName, "graft_lsh_bits"),
      (children: Seq[Expression]) => LshBits(children(0),
        intLit(children(1), "offset"), intLit(children(2), "nPlanes")): Expression),
    (FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (children: Seq[Expression]) => LshBuckets(children(0),
        intLit(children(1), "offset"), intLit(children(2), "nPlanes"),
        intLit(children(3), "nTables")): Expression),
    (FunctionIdentifier("graft_dsir_score"),
      new ExpressionInfo(classOf[LmScores.DsirScore].getName, "graft_dsir_score"),
      (children: Seq[Expression]) => LmScores.DsirScore(children(0), children(1),
        children(2), children(3), children(4)): Expression),
    (FunctionIdentifier("graft_lm_nll"),
      new ExpressionInfo(classOf[LmScores.LmNll].getName, "graft_lm_nll"),
      (children: Seq[Expression]) => LmScores.LmNll(children(0), children(1),
        children(2), children(3)): Expression),
    (FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder"),
      (children: Seq[Expression]) => ZOrder2(children(0), children(1)): Expression),
    (FunctionIdentifier("graft_editdist"),
      new ExpressionInfo(classOf[BoundedEditDistance].getName, "graft_editdist"),
      (children: Seq[Expression]) => BoundedEditDistance(children(0), children(1),
        intLit(children(2), "threshold")): Expression))

  /** Idempotent in-session registration (for sessions built without the
    * extensions config — Verify/Bench/tests). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
