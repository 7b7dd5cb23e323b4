package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for the LLM-data-pipeline surface (BASELINE.json
  * north-star: language-ID, quality scoring, token counting, document
  * fingerprinting). All are compositions of codegen'd built-ins — no UDFs —
  * so they stay inside whole-stage codegen and scale linearly with input.
  */
object TextOps {

  /** Lowercased word tokens (whitespace/punctuation boundaries). Matches the
    * ANSI `string_split_regex(lower(s), '[^a-z0-9]+')` modulo empty-token
    * filtering, which [[tokens]] performs explicitly for parity. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Whitespace token count (the cheap "how many words" measure). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: words + extra units for long
    * words (every 6 chars beyond the first 6 ≈ one more merge-piece).
    * A deterministic, tokenizer-free stand-in for real BPE counts. */
  def approxBpeCount(text: Column): Column =
    aggregate(
      transform(tokens(text), t => lit(1) + floor(length(t) / lit(6)).cast("int")),
      lit(0),
      (acc, x) => acc + x)

  /** Word n-gram shingles of the token stream (dedup/minhash input).
    *
    * Implemented as (n-1) zip_with folds of the token array against its
    * k-shifted tails, NOT as `transform(sequence(...), i => slice(ts,i,n))`:
    * an expression referenced inside a higher-order-function lambda body is
    * re-evaluated per ELEMENT (HOFs are interpreted, no CSE), so the slice
    * formulation re-tokenizes the whole document once per token — O(n²)
    * per doc (measured 60ms/doc at ~80 tokens). Arguments of a HOF evaluate
    * once per ROW, so the zip formulation is O(n).
    *
    * zip_with pads the shorter (shifted) side with nulls; the final filter
    * drops them, leaving exactly size-n+1 in-order shingles — identical to
    * the ANSI `range`-based mirror in OracleSql. */
  def wordShingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    if (n == 1) ts
    else {
      def shifted(k: Int): Column = {
        val t = tokens(text)
        when(size(t) <= k, array().cast("array<string>"))
          .otherwise(slice(t, lit(k + 1), size(t) - lit(k)))
      }
      val zipped = (1 until n).foldLeft(ts) { (acc, k) =>
        zip_with(acc, shifted(k),
          (a, b) => when(a.isNull || b.isNull, lit(null)).otherwise(concat(a, lit(" "), b)))
      }
      filter(zipped, x => x.isNotNull)
    }
  }

  /** Distinct word n-gram shingles. */
  def distinctWordShingles(text: Column, n: Int): Column =
    array_distinct(wordShingles(text, n))

  /** Largest 32-bit prime — modulus of the universal-hash permutations. */
  val MinhashP = 4294967291L

  /** MinHash signature from PRE-HASHED shingles: element i = min over
    * shingle hashes h of (aᵢ·h + bᵢ) mod p (universal hashing — Carter &
    * Wegman). One md5 per shingle total, k cheap arithmetic permutations,
    * instead of k md5 passes. aᵢ < 2²⁴ keeps aᵢ·h < 2⁵⁶ (no Long overflow).
    * Empty set → 2³² sentinels. */
  def minhashFromHashes(hashes: Column, k: Int): Column = {
    val sentinel = lit(4294967296L)
    array((0 until k).map { i =>
      val a = 999983L * i + 1000003L
      val b = 999979L * i + 12345L
      coalesce(array_min(transform(hashes, h => (h * a + b) % MinhashP)), sentinel)
    }: _*)
  }

  /** MinHash signature of a shingle-string set. */
  def minhashSignature(shingles: Column, k: Int): Column =
    minhashFromHashes(PortableHash.hash32Array(shingles), k)

  /** LSH band keys from a minhash signature: bands of `rowsPerBand` hashed
    * together; docs sharing any band key are near-dup candidates. The key
    * is a 64-bit hash of (band index, band slice) — an INTERNAL blocking
    * key whose equality structure is all that matters (the candidate join
    * is refined by exact Jaccard, so a ~2⁻⁶⁴ hash collision can only add a
    * candidate, never an output pair). 8-byte keys shuffle ~6× lighter
    * than the former `b_h1_h2_h3_h4` concat strings; the oracle builds its
    * own keys, so key representation is not part of the contract. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(
        lit(b.toLong) +:
          (0 until rowsPerBand).map(r => element_at(signature, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** SimHash (32-bit, word-feature): per token w, h = hash32(w); bit i of
    * the simhash is the sign of sum over tokens of (+1 if bit i of h else
    * -1). Near-dup docs differ in few bits (hamming distance).
    * Composed from array built-ins — ANSI-expressible via unnest+group. */
  def simhash32(text: Column): Column = {
    val hs = PortableHash.hash32Array(tokens(text))
    val bitVotes = (0 until 32).map { i =>
      aggregate(
        hs,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L), lit(1L)).otherwise(lit(-1L)))
    }
    bitVotes.zipWithIndex.map { case (v, i) =>
      when(v > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash words. */
  def hammingDistance32(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    (0 until 32).map(i => shiftright(x, i).bitwiseAND(lit(1L))).reduce(_ + _)
  }

  /** Rolling-hash document fingerprint: polynomial hash over the normalized
    * token stream (base 1000003, mod 2^31-1), order-sensitive — two docs
    * with the same tokens in different order fingerprint differently,
    * unlike a set hash. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      PortableHash.hash32Array(tokens(text)),
      lit(0L),
      (acc, h) => pmod(acc * lit(1000003L) + h, lit(2147483647L)))

  // --- language ID (n-gram/marker heuristic) -------------------------------

  /** Marker terms per language. A deterministic heuristic (the container has
    * no language models): score = count of marker-term occurrences in the
    * token stream, predicted language = argmax with 'en' fallback. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Occurrences of any of `terms` in the token stream. Fused codegen
    * set-probe ([[graft.plans.ArrayExprs.TokenMarkerCount]]) — the
    * `size(filter(...))` composition interprets a |terms|-way OR per
    * token (ExprParitySpec pins value equality). */
  def markerCount(toks: Column, terms: Seq[String]): Column =
    graft.plans.ArrayExprs.tokenMarkerCount(toks, terms)

  /** The declarative composition [[markerCount]] fuses (parity reference). */
  def markerCountComposed(toks: Column, terms: Seq[String]): Column =
    size(filter(toks, t => terms.map(m => t === lit(m)).reduce(_ || _)))

  /** Best-scoring language label; ties and all-zero resolve to the first
    * language in [[langMarkers]] order with maximal score. */
  def langId(text: Column): Column = langIdOf(tokens(text))

  /** [[langId]] over a pre-tokenized array — callers that derive several
    * metrics from one document should tokenize ONCE (behind a
    * [[graft.plans.ArrayExprs.sticky]] barrier) and use the `Of` forms:
    * each text-based form re-runs the regex split + filter per call. */
  def langIdOf(toks: Column): Column = {
    val scored = langMarkers.map { case (l, ms) => (l, markerCount(toks, ms)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.reverse
      .foldLeft(lit("und")) { case (acc, (l, s)) =>
        when(s === best && best > 0, lit(l)).otherwise(acc)
      }
  }

  // --- quality scoring -----------------------------------------------------

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "to", "in", "it", "that", "on")

  /** Chars that do NOT count as punctuation. Spelled as an explicit class
    * instead of `\s` because Java's `\s` includes vertical tab (\x0B) while
    * RE2's does not — the explicit class makes the engine and the DuckDB
    * oracle agree by construction on every input. */
  val NonPunctClass = "[a-zA-Z0-9 \\t\\n\\r\\f]"

  /** Count of punctuation chars (integer — exact, no division). */
  def punctHits(text: Column): Column =
    length(regexp_replace(text, NonPunctClass, ""))

  /** Ratio of non-alphanumeric, non-space chars to total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      punctHits(text).cast("double") / length(text))

  /** Ratio of stopword tokens to all tokens (prose-likeness signal). */
  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(text))

  /** [[stopwordRatio]] over a pre-tokenized array (see [[langIdOf]]). */
  def stopwordRatioOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(markerCount(toks, stopwords).cast("double") / size(toks))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = meanTokenLenOf(tokens(text))

  /** [[meanTokenLen]] over a pre-tokenized array (see [[langIdOf]]). */
  def meanTokenLenOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** Floor-quantization to 6 decimals. Used instead of `round` wherever the
    * value can be an EXACT decimal (ratios of small ints): `round` half-tie
    * behavior differs subtly across engines on such values, `floor(x·10⁶)`
    * is bit-deterministic everywhere (identical double in → identical out). */
  def quantize6(c: Column): Column = floor(c * lit(1000000.0)) / lit(1000000.0)

  /** PII scrubbing patterns — deliberately simple character-class regexes
    * (identical semantics under Java regex and RE2, so the oracle mirrors
    * them verbatim). Production pipelines layer locale-specific patterns
    * and ML detectors on top; the operator shape (codegen'd
    * regexp_replace, no UDF) is what matters at scale. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** Redact email addresses and phone-shaped digit runs. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Composite quality score in [0,1]: rewards mid-length docs, prose-like
    * stopword ratio, low punctuation noise. Deterministic heuristic in the
    * Gopher-rules style (length/punct/stopword filters). */
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))

  /** [[qualityScore]] with a pre-tokenized array (see [[langIdOf]]);
    * `text` is still needed for the length and punctuation signals. */
  def qualityScoreOf(text: Column, toks: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatioOf(toks) * lit(5.0), lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * lit(4.0), lit(0.0))
    quantize6(lenScore * lit(0.4) + stopScore * lit(0.3) + punctPenalty * lit(0.3))
  }

  /** Exact floor division of non-negative longs, expressed without an
    * integer-division builtin: `a - (a mod b)` is exactly divisible by `b`
    * and both sides stay < 2⁵³, so the intermediate double division is
    * bit-exact (an integer-valued double). */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** [[qualityScoreOf]] re-expressed in integer micro-units (0..1 000 000,
    * bigint) so a THRESHOLD decision on the score involves no floating-point
    * anywhere: every term is exact integer arithmetic over char/token COUNTS,
    * identical in any engine. Used where the score feeds a cut (q78's
    * `quality_micro < 500000`) rather than being reported as a double —
    * a `0.4999999…` vs `0.5000000…` flip can never depend on the engine's
    * double rounding or regex `\s` semantics.
    *
    *  - len_micro   = min(n_chars · 2000, 10⁶)                (= min(n_chars/500,1)·10⁶, exact)
    *  - stop_micro  = min(⌊5·10⁶ · stop_hits / n_toks⌋, 10⁶)
    *  - punct_micro = max(10⁶ − ⌊4·10⁶ · punct_hits / n_chars⌋, 0)
    *  - quality_micro = ⌊(4·len + 3·stop + 3·punct) / 10⌋
    */
  def qualityMicroOf(text: Column, toks: Column): Column = {
    val nChars = length(text).cast("long")
    val nToks = size(toks).cast("long")
    val sHits = markerCount(toks, stopwords).cast("long")
    val pHits = punctHits(text).cast("long")
    val lenMicro = least(nChars * lit(2000L), lit(1000000L))
    val stopMicro = least(
      when(nToks === lit(0L), lit(0L))
        .otherwise(idiv(lit(5000000L) * sHits, greatest(nToks, lit(1L)))),
      lit(1000000L))
    val punctMicro = greatest(
      lit(1000000L) - when(nChars === lit(0L), lit(0L))
        .otherwise(idiv(lit(4000000L) * pHits, greatest(nChars, lit(1L)))),
      lit(0L))
    idiv(lit(4L) * lenMicro + lit(3L) * stopMicro + lit(3L) * punctMicro, lit(10L))
  }
}
