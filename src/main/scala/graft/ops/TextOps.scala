package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting. All
  * pure Catalyst expressions (codegen'd, no UDFs) so they survive
  * whole-stage codegen at 100 TB scan scale.
  */
object TextOps {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** Tokens contained in a fixed word set, counted by the native
    * [[StopHits]] expression (one compiled loop; the
    * size(filter(tokens, isin)) form it replaced ran as an interpreted
    * lambda per token and is pinned as its spec twin in OpsSpec).
    */
  def stopwordHits(tokens: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.graft.shim.{toColumn, toExpression}
    toColumn(StopHits(toExpression(tokens), words))
  }

  /** BPE-ish subword token estimate: words + punctuation marks +
    * an extra token per 6 chars of long words (rough GPT-style rate).
    */
  def tokenCountBpe(text: Column): Column = {
    val words = size(split(trim(text), "\\s+"))
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    val longChars = length(regexp_replace(text, "\\b\\w{1,6}\\b|\\s|\\p{Punct}", ""))
    words + punct + (longChars / lit(6)).cast("int")
  }

  /** Quality features (length / punctuation / stopword / digit ratios)
    * and a composite score in [0, 1] — the classic pre-training quality
    * heuristics (C4/Gopher-style rules).
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val punctRatio = length(regexp_replace(text, "[^\\p{Punct}]", "")) / greatest(len, lit(1.0))
    val digitRatio = length(regexp_replace(text, "[^0-9]", "")) / greatest(len, lit(1.0))
    val upperRatio = length(regexp_replace(text, "[^A-Z]", "")) / greatest(len, lit(1.0))
    val stopHits = stopwordHits(split(lower(text), "\\s+"),
      Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "that", "for", "on", "with", "as", "was", "at", "by")).cast("double")
    val stopRatio = stopHits / greatest(nTokens, lit(1.0))
    val meanWordLen = len / greatest(nTokens, lit(1.0))
    val score =
      when(nTokens < 5, 0.0).otherwise(
        greatest(lit(0.0), least(lit(1.0),
          lit(0.5) + stopRatio * 1.5 - punctRatio * 2.0 - digitRatio * 1.5 -
            when(meanWordLen > 12 || meanWordLen < 2, 0.3).otherwise(0.0))))
    Seq(
      "n_chars_q" -> len.cast("long"),
      "n_tokens" -> nTokens.cast("long"),
      "punct_ratio" -> round(punctRatio, 6),
      "digit_ratio" -> round(digitRatio, 6),
      "upper_ratio" -> round(upperRatio, 6),
      "stopword_ratio" -> round(stopRatio, 6),
      "mean_word_len" -> round(meanWordLen, 6),
      "quality_score" -> round(score, 6))
  }

  /** Stopword-profile language ID over {en, de, fr, es, it}: the
    * language whose function words hit most tokens wins; ties and
    * no-hits → "und" (undetermined). Pure expressions — argmax via
    * sorted array of (hits, priority, lang) structs.
    */
  def langId(text: Column): Column = {
    val tokens = split(lower(text), "\\s+")
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
      "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
      "es" -> Seq("el", "la", "los", "que", "es", "no", "por", "una", "para", "con"),
      "it" -> Seq("il", "la", "che", "di", "non", "per", "una", "sono", "con", "del"))
    val scored = profiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        stopwordHits(tokens, words).as("hits"),
        lit(-i).as("prio"), // stable tie-break: earlier profile wins
        lit(lang).as("lang"))
    }
    val best = element_at(array_sort(array(scored: _*)), -1)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Content-defined fingerprint: hash of the case/punctuation/space
    * normalized text — the exact-dup key that survives formatting noise
    * (dupdet.py:82-89 uses sha512 of raw bytes; this is the normalized
    * variant; see also DedupOps.sha512 for the faithful one).
    */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** 64-bit rolling polynomial fingerprint (base-31 over normalized
    * chars) as a native expression chain: computed via aggregate over
    * the character codes — stays inside codegen, no UDF.
    */
  def fingerprint64(text: Column): Column = {
    val norm = regexp_replace(lower(text), "[^a-z0-9]", "")
    // aggregate over code points: h = (h*31 + c) mod p — the modulus
    // keeps the product inside long range (ANSI mode forbids wrapping).
    // split("") may emit a trailing "" element; it is filtered so the
    // hash is a pure function of the normalized characters (and matches
    // engines whose char-split emits no empty tail)
    aggregate(
      transform(filter(split(norm, ""), ch => length(ch) > 0),
        ch => ascii(ch).cast("long")),
      lit(0L),
      (h, c) => pmod(h * lit(31L) + c, lit(1000000007L)))
  }
}
