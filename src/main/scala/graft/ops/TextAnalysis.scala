package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword-count heuristic), quality scoring, token counting,
  * document fingerprinting. Everything is built from codegen'd column
  * functions / higher-order functions — no UDFs — so the whole pipeline
  * stays inside WholeStageCodegen and scales linearly with the corpus.
  */
object TextAnalysis {

  /** Lowercased, punctuation-stripped text (whitespace collapsed) — native
    * single-pass byte scan (`functions.NormalizeText`), pinned bit-identical
    * to the declarative regex chain (`normalizeDeclarative`,
    * `NormalizeTextSpec`). Fronts every text operator, so the two regex
    * evaluations per row it replaces were the corpus scan's dominant cost.
    */
  def normalize(text: Column): Column =
    graft.functions.NormalizeText.normalizeText(text)

  /** The declarative spelling of `normalize` — retained as the equivalence
    * oracle (and the exact chain the DuckDB correctness oracle mirrors).
    */
  def normalizeDeclarative(text: Column): Column =
    trim(regexp_replace(lower(regexp_replace(text, "[^a-zA-Z0-9 ]", " ")), " +", " "))

  /** Unicode normalization (UAX #15) to `form` — the canonicalization pass
    * that makes precomposed (U+00E9) and decomposed (e + U+0301) spellings
    * of the same text equal BEFORE any fingerprint/shingle/token equality
    * sees them ([[graft.functions.UnicodeNormalize]]; codegen'd, with
    * ASCII and already-normalized fast paths).
    */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    graft.functions.UnicodeNormalize.unicodeNormalize(text, form)

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: word pieces + standalone punctuation, the usual
    * pre-tokenizer regex (`\w+|[^\w\s]`). `regexp_extract_all` is available
    * in both Spark and DuckDB, keeping the correctness oracle exact.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\.,;:!\\?'\"\\(\\)\\[\\]\\{\\}-]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Fraction of characters that are digits. */
  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
      greatest(length(text), lit(1))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "a", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "es" -> Seq("el", "los", "que", "y", "es", "una", "para"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "zai", "you"))

  private def stopwordHits(text: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t)))
  }

  /** Fraction of tokens that are (English) stopwords — a standard quality
    * signal for training-data filtering.
    */
  def stopwordRatio(text: Column, lang: String = "en"): Column =
    stopwordHits(text, stopwords(lang)).cast("double") /
      greatest(tokenCount(text), lit(1))

  /** Token-level blocklist hits — the keyword safety/policy gate every
    * curation pipeline runs before the model-based ones: how many
    * normalized whole-word tokens of `text` appear in `words`.
    * Token-exact (no substring false positives: "assess" never hits
    * "ass"), one codegen'd projection — a corpus scrub is a filter, not
    * a shuffle. Callers bring their own list; the engine ships none.
    */
  def blocklistHits(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "blocklist must be non-empty")
    stopwordHits(text, words)
  }

  /** Composite quality score in [0,1]: favors texts of reasonable length,
    * low punctuation/digit noise, and some stopword mass. Deterministic and
    * SQL-expressible (same formula runs on the DuckDB oracle side).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    val digitPenalty = least(digitRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    greatest(
      lit(0.0),
      lenScore * 0.4 + stopScore * 0.2 + (lit(1.0) - punctPenalty) * 0.2 +
        (lit(1.0) - digitPenalty) * 0.2)
  }

  /** n-gram/stopword language-ID heuristic: count per-language stopword hits
    * and take the argmax with a fixed precedence order for ties
    * (en > de > fr > es > zh, then "und" for unknown). Real multilingual
    * corpora would swap in character-trigram frequency profiles; the
    * decision plumbing (per-language score columns → argmax) is identical.
    */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, stopwords("en"))
    val de = stopwordHits(text, stopwords("de"))
    val fr = stopwordHits(text, stopwords("fr"))
    val es = stopwordHits(text, stopwords("es"))
    val zh = stopwordHits(text, stopwords("zh"))
    val best = greatest(en, de, fr, es, zh)
    when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(de === best, lit("de"))
      .when(fr === best, lit("fr"))
      .when(es === best, lit("es"))
      .otherwise(lit("zh"))
  }

  /** Content fingerprint: md5 of the normalized text. Portable (md5 exists
    * in every engine), deterministic, and exactly what near-dup pipelines
    * use as the exact-dedup key after normalization.
    */
  def fingerprintMd5(text: Column): Column = md5(normalize(text).cast("binary"))

  /** Rolling-hash fingerprint (winnowing flavor): minimum 64-bit hash over
    * the k-char shingles of the normalized text. Two documents sharing their
    * minimum shingle hash are near-dup candidates; used as a cheap one-value
    * sketch next to the full MinHash signature in `Dedup`.
    */
  def minShingleHash(text: Column, k: Int = 8): Column =
    array_min(transform(Dedup.charShingles(normalize(text), k), s => xxhash64(s)))

  /** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
    * sorted distinct window-minimum shingle hashes of the normalized text —
    * one O(n) codegen'd scan ([[graft.functions.WinnowHashes]]). Any two
    * documents sharing a substring of ≥ `k + w - 1` normalized characters
    * share at least one fingerprint; density is ~2/(w+1) of the shingle
    * count, so the representation is a tunable-size position-robust
    * substring sketch (the exact-contamination signal whole-document
    * MinHash can't localize).
    */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.WinnowHashes.winnowHashes(normalize(text), k, w)

  /** Character-distribution profile of the normalized text from ONE
    * [[graft.functions.CharHistogram]] scan: struct(`n_chars`,
    * `n_distinct`, `top_frac`, `entropy`). `entropy` is the Shannon
    * entropy in nats over the character distribution — the
    * random-vs-natural-text quality signal (natural language sits near
    * 2.5–3.2 nats on this alphabet; key-mash / base64 / binary spill
    * pushes toward ln(36) ≈ 3.58, single-char runs toward 0) — computed
    * as an exact-decimal sum of per-character double terms so the value
    * never depends on fold order. `top_frac` (most common character's
    * share) flags degenerate repetition the entropy alone can blur. NULL
    * struct when the normalized text is empty.
    */
  def charProfile(text: Column): Column =
    Hof.bound(graft.functions.CharHistogram.charHistogram(normalize(text))) { hist =>
      Hof.bound(
        aggregate(hist, lit(0L), (a, s) => a + s.getField("n"))) { n =>
        val nd = n.cast("double")
        val entropy = aggregate(
          hist,
          lit(0).cast("decimal(28,18)"),
          (acc, s) => {
            val p = s.getField("n").cast("double") / nd
            (acc + (-p * log(p)).cast("decimal(28,18)")).cast("decimal(28,18)")
          },
          acc => acc.cast("double"))
        val topN = aggregate(hist, lit(0L),
          (a, s) => greatest(a, s.getField("n")))
        when(n <= 0, lit(null))
          .otherwise(struct(
            n.as("n_chars"),
            size(hist).cast("long").as("n_distinct"),
            (topN.cast("double") / nd).as("top_frac"),
            entropy.as("entropy")))
      }
    }

  /** PII patterns for corpus scrubbing, written in the regex subset Java
    * and RE2 evaluate identically (no lookaround, no escape-sequence
    * classes like `\s` whose spellings differ across SQL string literals):
    * training corpora are routinely scanned for emails/URLs/phone numbers
    * and redacted before use. All-codegen'd `regexp_*` column functions —
    * a full-corpus scrub is one projection, no UDFs.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val UrlPattern   = "https?://[A-Za-z0-9./?=&_%#:-]+"
  val PhonePattern = "[+][0-9][0-9() -]{7,}[0-9]"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def urlCount(text: Column): Column   = regexp_count(text, lit(UrlPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** Redact all three PII classes with typed placeholders (emails first so
    * an address inside a URL query string is caught before URL masking).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        UrlPattern, "[URL]"),
      PhonePattern, "[PHONE]")

  // --- Gopher quality rules (Rae et al. 2021, "Scaling Language Models" —
  // the published document-level heuristics most curation pipelines start
  // from). Every signal is a pure column expression (codegen'd, zero
  // shuffle: a full-corpus filter is one projection), and every arithmetic
  // form is chosen to be exactly recomputable by the SQL oracle. ---

  private val gopherStopwords =
    Seq("the", "and", "of", "to", "in", "a", "is")

  /** Per-document Gopher rule signals + the composite `gopher_keep` flag.
    * Words are the raw space-separated units (not `normalize`d — the rules
    * measure the RAW text's noisiness), lines the newline-separated ones.
    *
    *   - `n_words` in [`minWords`, `maxWords`]
    *   - `mean_word_chars` in [`minMeanWordChars`, `maxMeanWordChars`]
    *   - `symbol_word_ratio` ('#' or ellipsis per word) ≤ `maxSymbolRatio`
    *   - `bullet_line_frac` (lines starting `-`/`*`/`•`) ≤ `maxBulletFrac`
    *   - `ellipsis_line_frac` (lines ending `...`/`…`) ≤ `maxEllipsisFrac`
    *   - `alpha_word_frac` (words with ≥1 ASCII letter) ≥ `minAlphaFrac`
    *   - `stopword_count` (DISTINCT hits from a fixed 7-word list) ≥
    *     `minStopwords`
    */
  def gopherRules(
      df: DataFrame,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordChars: Double = 3.0,
      maxMeanWordChars: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val t = col(textCol)
    val words = split(t, " ")
    val nWords = size(words).cast("long")
    val nWordsSafe = greatest(nWords, lit(1L))
    // exact integer char total (no float accumulation): sum of word lengths
    val charTotal = aggregate(
      transform(words, w => length(w).cast("long")), lit(0L), (a, x) => a + x)
    val meanWordChars = charTotal.cast("double") / nWordsSafe
    // '#' per char diff; ellipsis occurrences via non-overlapping replace —
    // identical leftmost-non-overlapping semantics in Spark and DuckDB
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nEllipsis =
      (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3 +
        (length(t) - length(regexp_replace(t, "…", "")))
    val symbolRatio = (nHash + nEllipsis).cast("double") / nWordsSafe
    val lines = split(t, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("long")
    val bulletFrac = size(filter(lines, l =>
      l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .cast("double") / nLines
    val ellipsisFrac = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("double") / nLines
    val alphaFrac = size(filter(words, w => w.rlike("[a-zA-Z]")))
      .cast("double") / nWordsSafe
    val stopCount = gopherStopwords
      .map(w => array_contains(words, w).cast("int"))
      .reduce(_ + _)
    df.withColumn("n_words", nWords)
      .withColumn("mean_word_chars", meanWordChars)
      .withColumn("symbol_word_ratio", symbolRatio)
      .withColumn("bullet_line_frac", bulletFrac)
      .withColumn("ellipsis_line_frac", ellipsisFrac)
      .withColumn("alpha_word_frac", alphaFrac)
      .withColumn("stopword_count", stopCount)
      .withColumn(
        "gopher_keep",
        nWords.between(minWords, maxWords) &&
          meanWordChars.between(minMeanWordChars, maxMeanWordChars) &&
          symbolRatio <= maxSymbolRatio &&
          bulletFrac <= maxBulletFrac &&
          ellipsisFrac <= maxEllipsisFrac &&
          alphaFrac >= minAlphaFrac &&
          stopCount >= minStopwords)
  }

  /** Unicode scripts profiled by [[scriptMix]], in output order. Java
    * regex spells the char class `\p{IsXxx}`; RE2-family engines (the
    * DuckDB oracle) spell the same script `\p{Xxx}`.
    */
  val ScriptNames: Seq[String] =
    Seq("Latin", "Cyrillic", "Han", "Arabic", "Hangul", "Hiragana",
      "Katakana", "Devanagari", "Greek", "Hebrew")

  /** Per-document Unicode-script mix: `n_script_chars` (chars belonging to
    * ANY profiled script) and a `<script>_frac` column per profiled script
    * (fraction of those chars; 0.0 for script-free docs) — the
    * multilingual-corpus health signal that catches wrong-language
    * contamination and mixed-script mojibake `langId`'s stopword heuristic
    * can't see. One codegen'd projection: each script's count is a
    * `regexp_count` over the scan, no explode, no UDF.
    */
  def scriptMix(df: DataFrame, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val counts = ScriptNames.map(s =>
      s.toLowerCase -> regexp_count(t, lit(s"[\\p{Is$s}]")).cast("long"))
    val total = counts.map(_._2).reduce(_ + _)
    val totalSafe = greatest(total, lit(1L))
    val withTotal = df.withColumn("n_script_chars", total)
    counts.foldLeft(withTotal) { case (acc, (name, cnt)) =>
      acc.withColumn(s"${name}_frac", cnt.cast("double") / totalSafe)
    }
  }

  /** Convenience: the standard per-document analysis frame. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpeish_tokens", bpeishTokenCount(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("digit_ratio", digitRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprintMd5(t))
  }
}
