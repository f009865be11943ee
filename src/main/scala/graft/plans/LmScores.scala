package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scoring kernels for the literal-map LM family (perplexity
  * gate, DSIR importance weights).
  *
  * The HOF formulation — `aggregate(bigrams, 0L, acc + f(element_at(
  * bigMapLiteral, b)))` — hides an O(|vocab|) LINEAR SCAN per lookup:
  * Catalyst's `GetMapValue` on a 50,000-entry literal map walks the
  * key array, so scoring n docs costs n·|doc|·|vocab| comparisons
  * (measured 47 s for 50k docs at the sf1 rung — and invisible in
  * count-shaped benches, where column pruning drops the score column
  * entirely; the resampling query's checkpoint made it visible).
  *
  * These kernels precompute, ONCE per (deserialized) expression, a
  * java.util.HashMap from feature key to the feature's FINAL quantized
  * contribution — computed with arithmetic bit-identical to the HOF
  * (same op order, same `round(..., 0)` HALF_UP, same double widths),
  * so DuckDB oracles and the streaming parity are unchanged. Per
  * bigram the row path is then one hash lookup (plus a first-word
  * fallback for the LM's back-off term) instead of a 50k-entry scan:
  * sf1 scoring drops 47 s → sub-second, and the plan stays inside
  * whole-stage codegen via a reference-object call.
  *
  * The trained maps arrive as LITERAL children (`typedlit`), exactly
  * like the HOF they replace — plan shape, serialization, and the
  * "ship the model with the query" streaming story are unchanged. */
object LmScores {

  /** Spark's `round(x, 0)` for doubles (HALF_UP via BigDecimal) followed
    * by a long cast — bit-compatible with `round(col, 0).cast("long")`. */
  private[plans] def q6(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  private[plans] val Space = UTF8String.fromString(" ")

  private[plans] def litMap(e: Expression, what: String): (Array[UTF8String], Array[Long]) =
    e match {
      case Literal(m: MapData, MapType(StringType, LongType, _)) =>
        val n = m.numElements()
        val keys = new Array[UTF8String](n)
        val vals = new Array[Long](n)
        var i = 0
        while (i < n) {
          keys(i) = m.keyArray().getUTF8String(i)
          vals(i) = m.valueArray().getLong(i)
          i += 1
        }
        (keys, vals)
      case other => throw new IllegalArgumentException(
        s"$what must be a map<string,bigint> literal, got $other")
    }

  private[plans] def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a double literal, got $other")
  }

  /** Base for the two scorers: evaluates only the token-array child at
    * runtime; the literal children are folded into the precomputed
    * contribution map. */
  abstract class ScoreExpr extends Expression {
    def tokens: Expression
    override def dataType: DataType = LongType
    override def nullable: Boolean = tokens.nullable
    override def foldable: Boolean = false
    def score(toks: ArrayData): Long

    override def eval(input: InternalRow): Any = {
      val t = tokens.eval(input)
      if (t == null) null else score(t.asInstanceOf[ArrayData])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val ref = ctx.addReferenceObj("graftScore", this, classOf[ScoreExpr].getName)
      val c = tokens.genCode(ctx)
      ev.copy(code =
        code"""
          ${c.code}
          boolean ${ev.isNull} = ${c.isNull};
          long ${ev.value} = 0L;
          if (!${ev.isNull}) ${ev.value} = $ref.score(${c.value});
        """)
    }
  }

  /** DSIR importance weight: Σ over consecutive-token bigrams of
    * q6(ln(((t+1)·(rTot+V)) / ((r+1)·(tTot+V)))). Out-of-vocab bigrams
    * (absent from BOTH maps) contribute the constant q6(ln((rTot+V)/
    * (tTot+V))). */
  case class DsirScore(tokens: Expression, tMapL: Expression, rMapL: Expression,
                       rtvL: Expression, ttvL: Expression) extends ScoreExpr {
    override def children: Seq[Expression] = Seq(tokens, tMapL, rMapL, rtvL, ttvL)
    override def prettyName: String = "graft_dsir_score"
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(tokens = newChildren(0), tMapL = newChildren(1), rMapL = newChildren(2),
        rtvL = newChildren(3), ttvL = newChildren(4))

    @transient private lazy val rtv = litDouble(rtvL, "rtv")
    @transient private lazy val ttv = litDouble(ttvL, "ttv")
    @transient private lazy val oov: Long =
      q6(Math.log((1.0 * rtv) / (1.0 * ttv)) * 1000000.0)
    @transient private lazy val byKey: java.util.HashMap[UTF8String, java.lang.Long] = {
      val (tk, tv) = litMap(tMapL, "target counts")
      val (rk, rv) = litMap(rMapL, "raw counts")
      val t = new java.util.HashMap[UTF8String, java.lang.Long](tk.length * 2)
      var i = 0
      while (i < tk.length) { t.put(tk(i), tv(i)); i += 1 }
      val r = new java.util.HashMap[UTF8String, java.lang.Long](rk.length * 2)
      i = 0
      while (i < rk.length) { r.put(rk(i), rv(i)); i += 1 }
      val out = new java.util.HashMap[UTF8String, java.lang.Long](
        (tk.length + rk.length) * 2)
      val keys = new java.util.HashSet[UTF8String](t.keySet)
      keys.addAll(r.keySet)
      val it = keys.iterator()
      while (it.hasNext) {
        val k = it.next()
        val tc = t.get(k); val rc = r.get(k)
        val num = ((if (tc == null) 0L else tc.longValue()) + 1.0) * rtv
        val den = ((if (rc == null) 0L else rc.longValue()) + 1.0) * ttv
        out.put(k, q6(Math.log(num / den) * 1000000.0))
      }
      out
    }

    override def score(toks: ArrayData): Long = {
      val n = toks.numElements()
      if (n < 2) return 0L
      val m = byKey
      var acc = 0L
      var i = 0
      while (i < n - 1) {
        val b = UTF8String.concat(toks.getUTF8String(i), Space, toks.getUTF8String(i + 1))
        val q = m.get(b)
        acc += (if (q == null) oov else q.longValue())
        i += 1
      }
      acc
    }
  }

  /** Bigram-LM negative log likelihood (q6-quantized): Σ over bigrams of
    * −q6(ln((c2(b)+1) / (c1(w1)+V))) — add-one smoothing against the
    * first word's unigram count, V = vocabulary size. Precomputes the
    * contribution per known bigram, the back-off per known first word
    * (c2 = 0), and the double-unknown constant. */
  case class LmNll(tokens: Expression, bgMapL: Expression, w1MapL: Expression,
                   vocabL: Expression) extends ScoreExpr {
    override def children: Seq[Expression] = Seq(tokens, bgMapL, w1MapL, vocabL)
    override def prettyName: String = "graft_lm_nll"
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(tokens = newChildren(0), bgMapL = newChildren(1), w1MapL = newChildren(2),
        vocabL = newChildren(3))

    @transient private lazy val vocabN = litDouble(vocabL, "vocabN")
    @transient private lazy val w1 : java.util.HashMap[UTF8String, java.lang.Long] = {
      val (ks, vs) = litMap(w1MapL, "unigram counts")
      val m = new java.util.HashMap[UTF8String, java.lang.Long](ks.length * 2)
      var i = 0
      while (i < ks.length) { m.put(ks(i), vs(i)); i += 1 }
      m
    }
    /** contribution for bigrams present in c2 (uses the true c1 of the
      * first word, 0 if the unigram map lacks it — matches the HOF's
      * independent coalesce). */
    @transient private lazy val byBigram: java.util.HashMap[UTF8String, java.lang.Long] = {
      val (ks, vs) = litMap(bgMapL, "bigram counts")
      val m = new java.util.HashMap[UTF8String, java.lang.Long](ks.length * 2)
      var i = 0
      while (i < ks.length) {
        val k = ks(i)
        val sp = k.indexOf(Space, 0)
        val first = k.substring(0, sp)
        val c1 = w1.get(first)
        val cw1 = if (c1 == null) 0L else c1.longValue()
        m.put(k, -q6(Math.log((vs(i) + 1.0) / (cw1 + vocabN)) * 1000000.0))
        i += 1
      }
      m
    }
    /** back-off contribution per known first word (bigram unseen). */
    @transient private lazy val byFirst: java.util.HashMap[UTF8String, java.lang.Long] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](w1.size() * 2)
      val it = w1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        m.put(e.getKey, -q6(Math.log(1.0 / (e.getValue.longValue() + vocabN)) * 1000000.0))
      }
      m
    }
    @transient private lazy val unknown: Long =
      -q6(Math.log(1.0 / (0.0 + vocabN)) * 1000000.0)

    override def score(toks: ArrayData): Long = {
      val n = toks.numElements()
      if (n < 2) return 0L
      val m2 = byBigram; val m1 = byFirst
      var acc = 0L
      var i = 0
      while (i < n - 1) {
        val a = toks.getUTF8String(i)
        val b = UTF8String.concat(a, Space, toks.getUTF8String(i + 1))
        val q2 = m2.get(b)
        if (q2 != null) acc += q2.longValue()
        else {
          val q1 = m1.get(a)
          acc += (if (q1 == null) unknown else q1.longValue())
        }
        i += 1
      }
      acc
    }
  }
}
