package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level text/LLM-pipeline primitives. Everything here is built from
  * codegen'd built-ins (split / higher-order array functions / md5 / conv) —
  * no Scala UDFs — so the hot path stays inside whole-stage codegen and the
  * same values are reproducible in the DuckDB oracle.
  */
object TextOps {

  /** Whitespace tokens (single-space split, matching the corpus layout). */
  def tokens(text: Column): Column = split(text, " ")

  /** w-word shingles of a token array, e.g. shingles(tokens($"text"), 3).
    * Empty array when the doc has fewer than w tokens. Native one-pass
    * evaluation; [[shinglesHof]] is the value-semantics reference.
    */
  def shingles(toks: Column, w: Int): Column =
    graft.functions.expressions.NativeExprs.shingles(toks, w)

  /** Higher-order-function formulation of [[shingles]] — value-identical. */
  def shinglesHof(toks: Column, w: Int): Column = {
    val n = size(toks)
    when(n >= w,
      transform(sequence(lit(1), n - lit(w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** First 15 hex digits (60 bits) of md5(s) as a non-negative BIGINT —
    * an engine-portable string hash (DuckDB reproduces it from md5 hex).
    */
  def md5Prefix60(c: Column): Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 15), 16, 10).cast(LongType)

  /** 32-bit SimHash over the distinct tokens of a document, md5-based so the
    * oracle can reproduce it bit-for-bit. Bit b (b=0 is the MSB of the first
    * hex digit) is set iff Σ_tokens(2*bit_b(md5(token))-1) >= 0.
    * One pass per document, no explode/shuffle; evaluation is the native
    * expression (one md5 per token — the HOF twin below recomputes md5 per
    * nibble and exists as the value-semantics reference for tests).
    */
  def simhash32(toks: Column): Column =
    graft.functions.expressions.NativeExprs.simhash32(toks)

  /** Higher-order-function formulation of [[simhash32]] — value-identical. */
  def simhash32Hof(toks: Column): Column = {
    // per-token 32 bits (0/1) from the first 8 hex digits of md5(token)
    def bitsOf(t: Column): Column =
      flatten(transform(sequence(lit(1), lit(8)), i => {
        val nibble = conv(md5(t.cast(BinaryType)).substr(i, lit(1)), 16, 10)
          .cast(IntegerType)
        array(
          when(nibble.bitwiseAND(8) > 0, 1).otherwise(0),
          when(nibble.bitwiseAND(4) > 0, 1).otherwise(0),
          when(nibble.bitwiseAND(2) > 0, 1).otherwise(0),
          when(nibble.bitwiseAND(1) > 0, 1).otherwise(0))
      }))
    val sums = aggregate(
      array_distinct(toks),
      array_repeat(lit(0), 32),
      (acc, t) => zip_with(acc, bitsOf(t), (a, b) => a + b * 2 - 1))
    val powers = array((31 to 0 by -1).map(b => lit(1L << b)): _*)
    aggregate(
      zip_with(sums, powers, (s, p) => when(s >= 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** Hamming distance between two fingerprints (bit_count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Fixed per-language stopword lists for the n-gram-heuristic language ID.
    * Deliberately tiny and deterministic — the capability under test is the
    * scoring dataflow, not linguistic accuracy.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "y", "es", "un", "en"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "dans"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"))

  /** Stopword-hit count for one language over a token array (occurrence
    * count, native set-membership pass — value-identical to
    * size(filter(toks, _.isInCollection(words)))).
    */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    graft.functions.expressions.NativeExprs.countInSet(toks, words)

  /** Language-ID by argmax stopword-hit count, ties broken toward the
    * smallest language code; 'und' when no list scores > 0. Native
    * single-pass evaluation (one word→language-bitmask walk);
    * [[langIdComposed]] is the value-semantics reference.
    */
  def langId(toks: Column): Column =
    graft.functions.expressions.NativeExprs.langId(toks, langStopwords)

  /** Composed formulation of [[langId]] — value-identical: the CASE chain
    * checks languages in code order, which IS the smallest-code tie-break —
    * same shape as the oracle SQL.
    */
  def langIdComposed(toks: Column): Column = {
    val scores = langStopwords.sortBy(_._1).map { case (lang, words) =>
      lang -> stopwordHits(toks, words)
    }
    val top = greatest(scores.map(_._2): _*)
    val cases = scores.foldLeft(when(top === 0, "und")) {
      case (acc, (lang, score)) => acc.when(score === top, lang)
    }
    cases.otherwise("und")
  }
}
