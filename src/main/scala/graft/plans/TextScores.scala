package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers for the scan-local text-scoring kernels (r18,
  * guide §4): `TextFunctions.wordSetCount` / `fingerprint` were
  * higher-order-function chains — `size(filter(tokens, ...))` and
  * `aggregate(transform(tokens, ...))` — and HOFs are CodegenFallback:
  * the interpreted lambda evaluator runs per TOKEN per row, and the
  * language-ID vote evaluates five of them per document. These kernels
  * are one codegen'd pass each, bit-identical by construction
  * (TextFunctionsSpec pins kernel == HOF on the real corpus). */
object GraftScores {

  /** Count of tokens (occurrences, not distinct) equal to any of
    * `words` — exactly `size(filter(tokens, t => words.exists(t === _)))`
    * (a null token matches nothing, like the HOF's null predicate).
    * `words` is tiny (stopword tables, ≤ 7 entries), so a linear probe
    * over UTF8String byte-equality beats any set. */
  def wordCount(tokens: ArrayData, words: Array[UTF8String]): Int = {
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var j = 0
        while (j < words.length) {
          if (t.equals(words(j))) { c += 1; j = words.length }
          else j += 1
        }
      }
      i += 1
    }
    c
  }

  /** Rolling polynomial fingerprint — bitwise the HOF chain
    * `aggregate(transform(tokens, t => length(t)*131 +
    * ascii(substring(t,1,1))), 0L, (h,x) => (h*31+x) % 1000000007)`:
    * per token code = numChars*131 + first code point (0 for the empty
    * token, exactly `ascii('')`), folded left in array order. All
    * integer arithmetic; h stays < 1e9+7 so h*31+x never overflows. */
  def fingerprint(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      // precondition: tokens come from split() and are never null (the
      // HOF form would collapse the whole fold to NULL on one); a null
      // slot here scores as the empty token (code 0) instead of NPEing.
      val t = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      val code =
        if (t == null) 0L else t.numChars().toLong * 131L + firstCodePoint(t)
      h = (h * 31L + code) % 1000000007L
      i += 1
    }
    h
  }

  /** First Unicode code point of a UTF8String (0 when empty) — the
    * value `ascii(substring(t, 1, 1))` computes. */
  private def firstCodePoint(t: UTF8String): Long = {
    val nb = t.numBytes()
    if (nb == 0) return 0L
    val b0 = t.getByte(0) & 0xff
    if (b0 < 0x80) b0.toLong
    else {
      // multi-byte UTF-8: decode the first code point
      val len =
        if (b0 >= 0xf0) 4 else if (b0 >= 0xe0) 3 else 2
      var cp = b0 & (0xff >> (len + 1))
      var i = 1
      while (i < len && i < nb) {
        cp = (cp << 6) | (t.getByte(i) & 0x3f)
        i += 1
      }
      cp.toLong
    }
  }
}

/** `graft_word_count(tokens array<string>) -> int` with the word table
  * carried in the expression (stopword tables are compile-time
  * constants) — see [[GraftScores.wordCount]]. */
case class WordCount(child: Expression, words: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_word_count"

  @transient private lazy val table: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override def nullSafeEval(a: Any): Any =
    GraftScores.wordCount(a.asInstanceOf[ArrayData], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("wordTable", table,
      classOf[Array[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.GraftScores.wordCount($a, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_fingerprint(tokens array<string>) -> bigint` — see
  * [[GraftScores.fingerprint]]. */
case class Fingerprint(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(a: Any): Any =
    GraftScores.fingerprint(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.GraftScores.fingerprint($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
