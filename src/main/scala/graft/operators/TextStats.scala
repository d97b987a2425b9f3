package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.{GramSetCount, PunctCount, SubtokenCount, WordSetCount}

/** Text-analysis operators for a large-scale training-data pipeline:
  * token statistics, quality ratios, stopword-profile language ID, and
  * content fingerprinting — all pure narrow column expressions (no
  * UDFs, fully codegen'd), so they run embedded in the scan stage at
  * any scale with zero shuffles.
  */
object TextStats {

  /** Engine-identical whitespace class for the tokenizer contract:
    * Java's `\s` is `[ \t\n\x0B\f\r]` (INCLUDES U+000B vertical tab)
    * while DuckDB's RE2 `\s` is `[ \t\n\f\r]` (excludes it), so a
    * bare `\s+` split disagrees across engines on VT-bearing text and
    * breaks the hash gate. An explicit class is parsed identically by
    * both regex dialects — this constant is THE tokenizer whitespace
    * definition for every split in the engine and every DuckDB
    * oracle (round-10 ADVICE, EvalQueries q_gate_tradeoff).
    */
  val WsRegex: String = "[ \\t\\n\\r\\f]+"

  /** Whitespace tokens ([[WsRegex]] separators). */
  def tokens(text: Column): Column = split(text, WsRegex)

  /** Stopword profiles for the language-ID heuristic. Small,
    * high-frequency function words per language; zh uses romanized
    * particles as a stand-in (fixture texts are synthetic latin word
    * soup, so the interesting property is exact deterministic scoring,
    * not linguistic accuracy).
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "ich"),
    "es" -> Seq("el", "la", "que", "de", "y", "en", "un", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "que"))

  /** Count of whole-word matches of any of `words` in `text` —
    * single-pass kernel, regex-count parity pinned by
    * TextScanProperties (the oracles keep `\b(w|…)\b`).
    */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    Bridge.column(WordSetCount(Bridge.expression(text), words))

  /** Append `n_chars, n_tokens, avg_token_len, punct_ratio,
    * stopword_cnt` to `df`.
    */
  def addStats(df: DataFrame, text: Column): DataFrame = {
    val nChars = length(text).cast("long")
    val nTokens = size(tokens(text)).cast("long")
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTokens)
      // single-space-joined tokens: chars minus separators over count —
      // one FP division, deterministic across engines
      .withColumn("avg_token_len",
        (nChars - (nTokens - lit(1L))).cast("double") / nTokens)
      .withColumn("punct_ratio",
        Bridge.column(PunctCount(Bridge.expression(text))).cast("double") / nChars)
      .withColumn("stopword_cnt",
        stopwordCount(text, stopwordProfiles.head._2))
      // BPE-ish subword count: letter runs, single digits, punctuation
      // marks — the pre-tokenization pattern BPE vocabularies split on
      // (simplified to a dialect-portable regex)
      .withColumn("n_subtokens",
        Bridge.column(SubtokenCount(Bridge.expression(text))))
  }

  /** Append per-language stopword scores `score_<lang>` and the argmax
    * `lang_pred` (ties break toward the earlier profile — a fixed,
    * documented order, mirrored exactly in the oracle SQL).
    */
  def addLangId(df: DataFrame, text: Column): DataFrame = {
    val scored = stopwordProfiles.foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"score_$lang", stopwordCount(lower(text), words))
    }
    val langs = stopwordProfiles.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((lang, i), elseBranch) =>
        val rest = langs.drop(i + 1)
        val isMax = rest.map(o => col(s"score_$lang") >= col(s"score_$o"))
          .reduce(_ && _)
        when(isMax, lit(lang)).otherwise(elseBranch)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Composite quality score in [0,1] from the stat columns (requires
    * [[addStats]] upstream): long-enough docs with low punctuation
    * noise and a natural stopword rate score high. Weights are fixed
    * and the arithmetic is a small fixed FP expression — mirrored
    * exactly in the oracle SQL.
    */
  def qualityScore: Column = {
    val lengthTerm = least(col("n_tokens").cast("double") / lit(100.0), lit(1.0))
    val punctTerm = lit(1.0) - least(col("punct_ratio") * lit(5.0), lit(1.0))
    val stopTerm = least(col("stopword_cnt").cast("double") * lit(10.0) /
      col("n_tokens"), lit(1.0))
    (lengthTerm * lit(0.4)) + (punctTerm * lit(0.3)) + (stopTerm * lit(0.3))
  }

  /** Character-bigram profiles for the n-gram language-ID variant —
    * high-frequency bigrams per language (regex-portable, RE2 + Java).
    */
  val charNgramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "in", "er", "an"),
    "de" -> Seq("en", "er", "ch", "de", "ei"),
    "es" -> Seq("de", "en", "el", "la", "os"),
    "fr" -> Seq("es", "le", "de", "en", "on"))

  /** Append `ngram_<lang>` char-bigram counts and the argmax
    * `lang_pred_ngram` (same fixed tie-break order as [[addLangId]]).
    */
  def addCharNgramLangId(df: DataFrame, text: Column): DataFrame = {
    val scored = charNgramProfiles.foldLeft(df) { case (acc, (lang, grams)) =>
      acc.withColumn(s"ngram_$lang",
        Bridge.column(GramSetCount(Bridge.expression(lower(text)), grams)))
    }
    val langs = charNgramProfiles.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((lang, i), elseBranch) =>
        val isMax = langs.drop(i + 1)
          .map(o => col(s"ngram_$lang") >= col(s"ngram_$o")).reduce(_ && _)
        when(isMax, lit(lang)).otherwise(elseBranch)
    }
    scored.withColumn("lang_pred_ngram", pred)
  }

  /** Canonical content fingerprint: md5 of the case-folded,
    * whitespace-collapsed text. Stable across engines (md5 is md5),
    * usable as an exact-dedup key at any scale.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), WsRegex, " "))

  /** PII patterns for [[redactPii]]/[[piiCounts]] — the regex-rule
    * families every corpus anonymization pass starts from (emails,
    * international-format phone numbers, IPv4 addresses; the
    * BigScience-ROOTS / FineWeb anonymization shape). Deliberately
    * restricted to the regex subset where Java (Spark) and RE2
    * (DuckDB) agree exactly — character classes, bounded repetition,
    * grouping; no backreferences or lookaround — so the scrub itself
    * is oracle-checkable.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Per-category PII match counts: (n_emails, n_phones, n_ips) as a
    * struct — the detection side of the anonymization pass (pipelines
    * report counts per source before deciding to scrub or drop).
    * Pure narrow codegen'd projection; no shuffle anywhere.
    */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(EmailRe), lit(0)))
      .cast("long").as("n_emails"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0)))
      .cast("long").as("n_phones"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
      .cast("long").as("n_ips"))

  /** Redact all PII matches with typed placeholders — email first
    * (its domain would otherwise leave dot-digit residue for the IP
    * rule to half-match), then phone, then IPv4. Global replacement
    * in both engines (Spark regexp_replace is global; the oracle
    * passes the 'g' flag).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")
}
