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
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinHashSignature(children(0),
        intLit(children(1), "nShingle"), intLit(children(2), "numHashes")): Expression),
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children(0),
        intLit(children(1), "n")): Expression),
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
