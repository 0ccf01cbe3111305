package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY §2E — text-analysis column functions for the documents
  * pipeline. Everything here is built from codegen'd Catalyst builtins
  * and higher-order functions (no UDFs): at 100 TB these run inside
  * whole-stage codegen on the scan projection, shuffle nothing, and
  * push `doc_id`/`lang` pruning straight to parquet.
  *
  * Cross-engine note: each function has a DuckDB twin in
  * [[graft.Oracles.text]] built from the *same* expression tree
  * (same operation order), so doubles agree bit-for-bit before the
  * final `round(_, 4)`.
  */
object TextFunctions {

  /** Non-empty whitespace-separated tokens. (Materializing the token
    * array costs an interpreted `filter` HOF pass — count-only
    * callers use [[wsTokenCount]]/[[tokenCountIn]], which stay in
    * codegen via regexp_count.) */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  /** Count of non-empty whitespace tokens = count of maximal
    * non-space runs — `regexp_count` is a codegen'd builtin, equal to
    * `size(tokens(text))` for every string (TextFunctionsSpec proves
    * it on randomized input). */
  def wsTokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+"))

  /** HOF reference formulation of [[wsTokenCount]] (spec only). */
  def wsTokenCountRef(text: Column): Column = size(tokens(text))

  /** BPE-ish segmentation: letter runs, digit runs, single other
    * non-space chars — the classic pre-tokenizer regex shape. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern))

  /** Tokens found in `words` (e.g. a stopword list). One codegen'd
    * regexp_count pass: pad the text with spaces, then count
    * `\s(word1|word2|…)(?=\s)` — the consumed leading space plus the
    * zero-width trailing lookahead select exactly the whitespace
    * tokens equal to a listed word (consecutive hits share the
    * boundary space via the lookahead). Equal to the
    * filter-isInCollection HOF form on every string
    * (TextFunctionsSpec, randomized). */
  def tokenCountIn(text: Column, words: Seq[String]): Column = {
    // an empty list or an empty/whitespace-bearing word would turn the
    // alternation into a pattern that matches whitespace runs — a
    // silent divergence from the token-membership semantics
    require(words.nonEmpty &&
      words.forall(w => w.nonEmpty && !w.exists(_.isWhitespace)),
      s"tokenCountIn needs non-empty, whitespace-free words: $words")
    val alt = words.map(java.util.regex.Pattern.quote).mkString("|")
    regexp_count(concat(lit(" "), text, lit(" ")),
      lit(s"\\s(?:$alt)(?=\\s)"))
  }

  /** HOF reference formulation of [[tokenCountIn]] (spec only). */
  def tokenCountInRef(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isInCollection(words)))

  val EnStopwords = Seq("the", "a", "is", "of")

  /** Characters outside [a-z0-9 whitespace]. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^a-z0-9\\s]"))

  /** Sentence count: terminator runs ('.', '!', '?'), floored at 1 so
    * a terminator-free document is one sentence — the segmentation
    * primitive readability, the quality ensemble and text_sentences
    * share (one seam, mirrored in every oracle as
    * `greatest(len(regexp_extract_all(text, '[.!?]+')), 1)`). Exact
    * integer, codegen'd regexp_count — fully hash-gatable. */
  def sentenceCount(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")), lit(1))

  /** Sentence segmentation: maximal terminator-terminated chunks plus
    * the un-terminated tail, space-trimmed, empties dropped — the
    * materializing twin of [[sentenceCount]] (the tokens/wsTokenCount
    * pairing). HOF transform+filter passes are interpreted, but the
    * per-row element count is the sentence count — orders of
    * magnitude below the token count that rule governs. */
  def sentences(text: Column): Column =
    filter(
      transform(
        regexp_extract_all(text, lit("[^.!?]+[.!?]+|[^.!?]+$"), lit(0)),
        s => trim(s)),
      s => length(s) > 0)

  /** Composite quality score in [0,1]: favors long docs with low
    * stopword and punctuation mass. Mirrors the oracle expression
    * order exactly — do not reassociate. */
  def qualityScore(nTok: Column, stopRatio: Column, punctRatio: Column): Column =
    lit(0.5) * least(lit(1.0), nTok / lit(200.0)) +
      lit(0.3) * (lit(1.0) - stopRatio) +
      lit(0.2) * (lit(1.0) - punctRatio)

  /** Marker-word vocabularies for the language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "los", "y"),
    "fr" -> Seq("le", "les", "et"))

  /** Rolling polynomial hash over the document's characters:
    * h_0 = 0; h_i = (h_{i-1} * 31 + ascii(c_i)) mod 1e9+7, as a
    * native codegen expression ([[PolyHash]] — the HOF fold ran
    * interpreted). The DuckDB list_reduce oracle matches exactly on
    * ASCII text. (Reference computes handler-side digests in Python;
    * here the fold runs inside the scan's generated code.) */
  val FpMod = 1000000007L
  def polyFingerprint(text: Column): Column = PolyHash(text, 31L, FpMod)
}
