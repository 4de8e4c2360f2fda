package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-scan expressions replacing regexp chains and
  * interpreted higher-order lambdas in the text-analysis hot path.
  * Each is documented by (and property-tested against) the exact
  * Spark-SQL composition it replaces; the DuckDB oracle formulas are
  * unchanged.
  */
private[graft] trait TextScanExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
}

/** `mode = "alpha"`: count of code points in [a-z] — equals
  * `length(regexp_replace(t, "[^a-z]", ""))`.
  * `mode = "punct"`: count of code points NOT in [a-z0-9 ] — equals
  * `length(regexp_replace(t, "[a-z0-9 ]", ""))`. */
case class CharClassCount(child: Expression, mode: String)
    extends TextScanExpression {
  require(mode == "alpha" || mode == "punct", s"unknown mode $mode")

  override def dataType: DataType = IntegerType
  override def prettyName: String = s"char_class_count_$mode"

  override def nullSafeEval(input: Any): Any =
    CharClassCount.compute(input.asInstanceOf[UTF8String], mode == "alpha")

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharClassCount.compute($c, ${mode == "alpha"})")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object CharClassCount {
  def alpha(text: Column): Column = ColumnBridge.column(
    CharClassCount(ColumnBridge.expression(text), "alpha"))
  def punct(text: Column): Column = ColumnBridge.column(
    CharClassCount(ColumnBridge.expression(text), "punct"))

  def compute(text: UTF8String, alpha: Boolean): Int = {
    val s = text.toString
    val len = s.length
    var i = 0
    var c = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      if (alpha) { if (cp >= 'a' && cp <= 'z') c += 1 }
      else if (!((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') ||
                 cp == ' ')) c += 1
      i += Character.charCount(cp)
    }
    c
  }
}

/** Normalized text — equals `trim(regexp_replace(regexp_replace(
  * lower(t), "[^a-z0-9 ]", ""), " +", " "))`: lowercase, keep only
  * [a-z0-9 ], collapse space runs, trim. Lowercasing delegates to
  * UTF8String.toLowerCase, the exact engine of Spark's `lower()`. */
case class NormalizeText(child: Expression) extends TextScanExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object NormalizeText {
  def apply(text: Column): Column = ColumnBridge.column(
    NormalizeText(ColumnBridge.expression(text)))

  def compute(text: UTF8String): UTF8String = {
    val s = text.toLowerCase.toString
    val len = s.length
    val out = new java.lang.StringBuilder(len)
    var pendingSpace = false
    var i = 0
    while (i < len) {
      val ch = s.charAt(i)
      if ((ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')) {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(ch)
      } else if (ch == ' ' && out.length > 0) pendingSpace = true
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** Count of non-empty single-space-delimited tokens — equals
  * `size(filter(split(t, " "), x -> x <> ''))`. */
case class TokenCount(child: Expression) extends TextScanExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TokenCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object TokenCount {
  def apply(text: Column): Column =
    ColumnBridge.column(TokenCount(ColumnBridge.expression(text)))

  def compute(text: UTF8String): Int = {
    val bytes = text.getBytes
    var c = 0
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) inTok = false
      else if (!inTok) { c += 1; inTok = true }
      i += 1
    }
    c
  }
}

/** Gopher-style repetition signals in ONE tokenization pass:
  * `[n_words, n_distinct_words, max_word_count, max_bigram_count]` over
  * single-space-delimited tokens (empties dropped). Equals the
  * composition (with `toks = filter(split(t, " "), x -> x <> '')`):
  *   - n_words            = `size(toks)`
  *   - n_distinct_words   = `size(array_distinct(toks))`
  *   - max_word_count     = `array_max(transform(array_distinct(toks),
  *                            w -> size(filter(toks, x -> x = w))))` (0 if empty)
  *   - max_bigram_count   = same over adjacent-pair strings `wᵢ + " " + wᵢ₊₁`
  * The composition is O(n²) interpreted lambda work per row; this is one
  * hash-counting pass. */
case class RepetitionStats(child: Expression) extends TextScanExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object RepetitionStats {
  def apply(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))

  def compute(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val wordCnt = new java.util.HashMap[UTF8String, Int]()
    val bigramCnt = new java.util.HashMap[UTF8String, Int]()
    val space = UTF8String.fromString(" ")
    var nWords = 0
    var maxWord = 0
    var maxBigram = 0
    var prev: UTF8String = null
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      // a space byte (0x20) never occurs inside a UTF-8 multibyte seq
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start) {
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          nWords += 1
          val wc = wordCnt.merge(tok, 1, Integer.sum)
          if (wc > maxWord) maxWord = wc
          if (prev != null) {
            val bg = UTF8String.concat(prev, space, tok)
            val bc = bigramCnt.merge(bg, 1, Integer.sum)
            if (bc > maxBigram) maxBigram = bc
          }
          prev = tok
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(
      Array(nWords, wordCnt.size, maxWord, maxBigram))
  }
}

/** Per-group counts of whitespace tokens that belong to each word set,
  * in ONE tokenization pass. Element g equals
  * `size(filter(filter(split(t, " "), x -> x <> ''),
  *              x -> array_contains(group_g, x)))`. */
case class StopwordHitsArray(child: Expression, groups: Seq[Seq[String]])
    extends TextScanExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_hits"

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    groups.map { g =>
      val s = new java.util.HashSet[UTF8String](g.size * 2)
      g.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    StopwordHitsArray.compute(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.StopwordHitsArray.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object StopwordHitsArray {
  def apply(text: Column, groups: Seq[Seq[String]]): Column =
    ColumnBridge.column(
      StopwordHitsArray(ColumnBridge.expression(text), groups))

  def compute(text: UTF8String,
              sets: Array[java.util.HashSet[UTF8String]]): GenericArrayData = {
    val bytes = text.getBytes
    val counts = new Array[Int](sets.length)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      // a space byte (0x20) never occurs inside a UTF-8 multibyte seq
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start) {
          val tok = UTF8String.fromBytes(bytes, start, i - start)
          var g = 0
          while (g < sets.length) {
            if (sets(g).contains(tok)) counts(g) += 1
            g += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
