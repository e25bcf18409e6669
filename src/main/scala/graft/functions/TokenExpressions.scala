package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot tokenize → window paths.
  *
  * Spark's higher-order functions (`transform`, lambda `slice`, `aggregate`)
  * are evaluated INTERPRETED with per-element boxing — they never enter
  * whole-stage codegen. Profiling x15 at sf0.1 (30.7 M windows over 250 MB
  * of text) showed the `transform(regexp_extract_all…)` tokenizer plus the
  * `tokenNgrams` gram-string transform dominating the whole curation chain;
  * swapping the gram STRING for cheaper per-window arithmetic inside the
  * same HOF machinery recovered almost nothing (15.5 → 13.9 s), proving the
  * interpreter overhead, not the bytes, is the cost. These expressions do
  * the same work as single codegen'd static calls over UTF8String bytes.
  *
  * Semantics contracts (pinned by TokenExprSpec equivalence tests and the
  * DuckDB oracles that recompute them in SQL):
  *  - [[AsciiTokens]] ≡ `transform(regexp_extract_all(s, '[A-Za-z0-9]+', 0),
  *    lower)` — maximal ASCII-alphanumeric runs, lowercased. Byte-scan is
  *    exact: UTF-8 continuation/lead bytes have the high bit set and can
  *    never match the ASCII class, and supplementary characters decode to
  *    surrogates (non-alnum) under the regex, so byte runs == char runs.
  *  - [[AsciiTokenCount]] ≡ `size(AsciiTokens(s))` without building tokens.
  *  - [[WindowXx64Keys]]: 64-bit order-sensitive keys of every n-token
  *    sliding window — per-token `XXH64(bytes, seed=42)` chained through
  *    `XXH64.hashLong(tokenHash, acc)`. The SAME xxhash64 primitive Spark's
  *    `xxhash64()` uses, but the chain layout is this library's own
  *    convention: fast-mode keys are NOT oracle-recomputable (that is what
  *    the md5-of-gram-string mode is for).
  */
case class AsciiTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_ascii_tokens requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ascii_tokens"

  override def nullSafeEval(input: Any): Any =
    AsciiTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AsciiTokens$$.MODULE$$.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokens =
    copy(child = newChild)
}

/** THE byte-class predicate that defines the shared tokenization convention
  * — exactly one definition, so [[AsciiTokens]] and [[AsciiTokenCount]] can
  * never drift apart (dupWindowStats' counts pass and keyed pass must see
  * the same windows, or n_dup_windows could go negative). */
private[functions] object AsciiScan {
  @inline def isAlnum(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
}

object AsciiTokens {
  import AsciiScan.isAlnum

  /** Shared by interpreted eval and generated code. */
  def tokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    val out = new java.util.ArrayList[AnyRef]
    var i = 0
    while (i < len) {
      if (isAlnum(bytes(i))) {
        val start = i
        var upper = false
        while (i < len && isAlnum(bytes(i))) {
          if (bytes(i) >= 'A' && bytes(i) <= 'Z') upper = true
          i += 1
        }
        // fresh copy (never a view of the page text: a view would pin the
        // whole row's bytes in any downstream cache), lowercased in place
        val tok = java.util.Arrays.copyOfRange(bytes, start, i)
        if (upper) {
          var j = 0
          while (j < tok.length) {
            if (tok(j) >= 'A' && tok(j) <= 'Z') tok(j) = (tok(j) + 32).toByte
            j += 1
          }
        }
        out.add(UTF8String.fromBytes(tok))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `size(graft_ascii_tokens(s))` as one allocation-free byte scan — the
  * window-count side of [[graft.ops.Dedup.dupWindowStats]] needs only the
  * token COUNT per document, never the tokens. */
case class AsciiTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_ascii_token_count requires string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ascii_token_count"

  override def nullSafeEval(input: Any): Any =
    AsciiTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AsciiTokenCount$$.MODULE$$.count($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokenCount =
    copy(child = newChild)
}

object AsciiTokenCount {
  import AsciiScan.isAlnum

  /** Shared by interpreted eval and generated code. */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    val len = bytes.length
    var n = 0
    var i = 0
    var in = false
    while (i < len) {
      val a = isAlnum(bytes(i))
      if (a && !in) n += 1
      in = a
      i += 1
    }
    n
  }
}

/** 64-bit keys of every n-token sliding window over a token array, with no
  * gram-string materialization: token t hashes once via
  * `XXH64.hashUTF8String(t, 42)`, window (i..i+n-1) chains its token hashes
  * through `acc = XXH64.hashLong(tokenHash, acc)` starting from seed 42 —
  * order-sensitive and boundary-safe (distinct token SPLITS differ in the
  * per-token hashes even when the concatenated bytes agree, which the
  * space-joined gram form also guaranteed). Arrays shorter than n yield an
  * empty array. O(n·T) hashLong steps — n is a small constant (8 here, ~50
  * in production window-dedup configs) and hashLong is a handful of
  * multiplies, so the pass stays cheap relative to tokenization. */
case class WindowXx64Keys(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_window_keys requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_keys"

  override def nullSafeEval(input: Any): Any =
    WindowXx64Keys.keys(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WindowXx64Keys$$.MODULE$$.keys($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WindowXx64Keys =
    copy(child = newChild)
}

object WindowXx64Keys {

  private val Seed = 42L // Spark's own xxhash64 default seed

  /** Shared by interpreted eval and generated code. A null token (possible
    * for arrays not produced by [[AsciiTokens]]) hashes as hashLong(0). */
  def keys(toks: ArrayData, n: Int): ArrayData = {
    val t = toks.numElements()
    if (t < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](t)
    var i = 0
    while (i < t) {
      val s = toks.getUTF8String(i)
      th(i) = if (s == null) XXH64.hashLong(0L, Seed) else XXH64.hashUTF8String(s, Seed)
      i += 1
    }
    val out = new Array[Long](t - n + 1)
    i = 0
    while (i < out.length) {
      var acc = Seed
      var j = i
      val end = i + n
      while (j < end) { acc = XXH64.hashLong(th(j), acc); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Space-joined n-grams of a token array as one native pass — the gram
  * STRING form whose md5 the DuckDB oracles recompute (d07/d16/d22/d27), so
  * unlike [[WindowXx64Keys]] this one must reproduce the SQL reference
  * `transform(sequence(1, size-n+1), i -> array_join(slice(toks, i, n), ' '))`
  * byte-for-byte (pinned by TokenExprSpec): `array_join` SKIPS null elements
  * and their separators, so a null token contributes nothing to its grams.
  * Fewer than n tokens → empty array. Output strings are fresh buffers,
  * never views of the input. */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_token_ngrams requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_ngrams"

  override def nullSafeEval(input: Any): Any =
    TokenNgrams.grams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenNgrams$$.MODULE$$.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

object TokenNgrams {

  /** Shared by interpreted eval and generated code. */
  def grams(toks: ArrayData, n: Int): ArrayData = {
    val t = toks.numElements()
    if (t < n) return new GenericArrayData(Array.empty[AnyRef])
    // materialize token byte arrays once (getUTF8String per (gram, slot)
    // would re-read the ArrayData n times per token)
    val tb = new Array[Array[Byte]](t)
    var i = 0
    while (i < t) {
      val s = toks.getUTF8String(i)
      tb(i) = if (s == null) null else s.getBytes
      i += 1
    }
    val out = new Array[AnyRef](t - n + 1)
    i = 0
    while (i < out.length) {
      var len = 0
      var present = 0
      var j = i
      val end = i + n
      while (j < end) {
        if (tb(j) != null) { len += tb(j).length; present += 1 }
        j += 1
      }
      if (present > 1) len += present - 1 // separators between present tokens
      val g = new Array[Byte](len)
      var pos = 0
      var first = true
      j = i
      while (j < end) {
        if (tb(j) != null) {
          if (!first) { g(pos) = ' '; pos += 1 }
          System.arraycopy(tb(j), 0, g, pos, tb(j).length)
          pos += tb(j).length
          first = false
        }
        j += 1
      }
      out(i) = UTF8String.fromBytes(g)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TokenFunctions {
  import org.apache.spark.sql.graft.Shims
  import org.apache.spark.sql.Column
  /** Column-level entry points used by ops.TextOps / ops.Dedup / ops.Decontam. */
  def asciiTokens(c: Column): Column = Shims.column(AsciiTokens(Shims.expression(c)))
  def asciiTokenCount(c: Column): Column = Shims.column(AsciiTokenCount(Shims.expression(c)))
  def windowXx64Keys(c: Column, n: Int): Column = Shims.column(WindowXx64Keys(Shims.expression(c), n))
  def tokenNgrams(c: Column, n: Int): Column = Shims.column(TokenNgrams(Shims.expression(c), n))
}
