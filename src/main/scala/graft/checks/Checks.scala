package graft.checks

import graft.model.Span
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Checker plugins re-expressed over the span model (SURVEY.md §2.4-2.5,
  * reference plugin/checkers). Each checker is a Column-producing
  * module over the processed page rows; defects carry the deterministic
  * order key (popPos=pos, phase).
  *
  * Phases: 4 dupdetect, 5 seo:huge_internal, 6 seo:duplicit_inline,
  * 7 meta description, 8 meta keywords, 9 noscript, 10 seoimg, 11 mail.
  *
  * Declared deviation: dupdetect emits ONE defect per duplicate page,
  * citing the EARLIEST prior page with equal (size, body) and different
  * URI — the reference emits one per prior and carries a hash-filling
  * bug (dupdet.py:70-71 hashes the current file when backfilling a
  * prior's hash); we implement the documented intent (size class +
  * content hash), identically in oracle and engine.
  */
object Checks {

  /** Canonical body of a document: its spans in offset order, fields
    * joined with control separators. The dup-detection content key
    * (stands in for the downloaded file bytes, dupdet.py:82-89).
    */
  def bodyString(spans: Seq[Span]): String =
    spans.sortBy(_.offset).map(s =>
      s"${s.kind}${Option(s.text).getOrElse("")}${Option(s.media_ref).getOrElse("")}")
      .mkString("")

  /** Column twin of [[bodyString]] over a sorted spans array column. */
  def bodyStringCol(spansSorted: Column): Column =
    concat_ws("", transform(spansSorted, s =>
      concat_ws("", coalesce(s.getField("kind"), lit("")),
        coalesce(s.getField("text"), lit("")),
        coalesce(s.getField("media_ref"), lit("")))))

  private def ofKind(spansSorted: Column, k: String): Column =
    filter(spansSorted, s => s.getField("kind") === k)

  /** Per-page checker defects for OK text/html rows as ONE projection:
    * every checker contributes an array<struct(phase,typeName,evidence,
    * severity)> built with higher-order expressions (no windows, no
    * per-checker branches), concatenated and exploded once — a single
    * scan of the cached page rows instead of a 12-way union.
    * Input columns: pos, seq, spansSorted. Output: popPos, phase,
    * responseSeq, typeName, evidence, severity.
    */
  def pageDefects(okHtml: DataFrame): DataFrame =
    okHtml.select(col("pos"), col("seq"), explode(col("defArr")).as("d"))
      .select(col("pos").as("popPos"), col("d.phase").as("phase"),
        col("seq").as("responseSeq"), col("d.typeName").as("typeName"),
        col("d.evidence").as("evidence"), col("d.severity").as("severity"),
        col("d.sub").as("sub"))

  /** The per-page checker defect array (struct(phase,typeName,evidence,
    * severity)) as one expression over a sorted spans column — computed
    * once into the round's cached page rows, then exploded by
    * [[pageDefects]] (the heavy expression evaluates exactly once per
    * page, inside the cache materialization).
    */
  def pageDefectsArr(sp: Column): Column = {
    import org.apache.spark.sql.types.StringType

    def mk(phase: Int, name: String, evidence: Column, sev: Double): Column =
      struct(lit(phase).as("phase"), lit(name).as("typeName"),
        evidence.cast(StringType).as("evidence"), lit(sev).as("severity"),
        lit(0).as("sub"))
    /** singleton defect gated by a condition (type-stable empty via filter) */
    def one(cond: Column, phase: Int, name: String, evidence: Column, sev: Double): Column =
      filter(array(mk(phase, name, evidence, sev)), _ => cond)
    /** rewrite `sub` to the element's index — the within-phase emission
      * order of the reference's serial plugin loop (database.py:156-169
      * assigns defect-type ids first-seen in emission order; without
      * `sub`, two types first appearing at the same (popPos, phase)
      * would tie nondeterministically).
      */
    def reindex(arr: Column): Column = transform(arr, (d, i) =>
      struct(d.getField("phase").as("phase"), d.getField("typeName").as("typeName"),
        d.getField("evidence").as("evidence"), d.getField("severity").as("severity"),
        i.cast("int").as("sub")))

    // css_scraper internal <style> (css_scraper.py:52-60): first block
    val cssLen = octet_length(try_element_at(ofKind(sp, "css-int"), lit(1)).getField("text"))
    val huge = one(cssLen.isNotNull && cssLen > 1024, 5, "seo:huge_internal", cssLen, 0.5)

    // css_scraper inline dups (css_scraper.py:62-68): each repeat of a
    // style value after its first in-page occurrence (prefix scan)
    val styleTexts = transform(ofKind(sp, "style"), s => s.getField("text"))
    val dupVals = when(size(styleTexts) < 2, filter(styleTexts, _ => lit(false)))
      .otherwise(filter(
        transform(sequence(lit(2), greatest(size(styleTexts), lit(2))), i =>
          when(array_position(slice(styleTexts, lit(1), i - 1), element_at(styleTexts, i)) > 0,
            element_at(styleTexts, i))),
        x => x.isNotNull))
    val inlineDup = reindex(transform(dupVals, v => mk(6, "seo:duplicit_inline", v, 0.1)))

    // seo_meta (seo_meta.py:24-49)
    def metaCount(name: String): Column =
      size(filter(ofKind(sp, "meta"), s => s.getField("text") === name))
    val nDesc = metaCount("description")
    val nKeys = metaCount("keywords")
    val meta = concat(
      one(nDesc === 0, 7, "seo:nodsc", lit(""), 0.4),
      one(nDesc > 1, 7, "seo:multidsc", nDesc, 0.4),
      one(nKeys === 0, 8, "seo:nokeys", lit(""), 0.4),
      one(nKeys > 1, 8, "seo:multikeys", nKeys, 0.4))

    // no_script (no_script.py:17-30): PER SPAN, miss before no-comment —
    // the reference loop runs both checks on span k before span k+1,
    // and first-seen defect-type ids depend on that interleave (a span
    // failing only the comment check ahead of one failing only the
    // noscript check must order script-no-comment first).
    val scripts = reindex(flatten(transform(ofKind(sp, "script"), s => concat(
      one(!s.getField("text").contains("noscript"), 9, "noscript-miss",
        concat(lit("Script: "), s.getField("text")), 0.7),
      one(!s.getField("text").contains("comment"), 9, "script-no-comment",
        concat(lit("Script: "), s.getField("text")), 0.4)))))

    // seo_images (seo_images.py:22-37): flags ride in media_ref; per
    // span, nowidth before noheight (same interleave argument)
    val imgs = reindex(flatten(transform(ofKind(sp, "img"), s => {
      val flags = coalesce(s.getField("media_ref"), lit(""))
      concat(
        one(!flags.contains("w"), 10, "seo:img:nowidth", s.getField("text"), 0.6),
        one(!flags.contains("h"), 10, "seo:img:noheight", s.getField("text"), 0.6))
    })))

    // mailer (mailer.py:27-50), default config: mailto links only
    val mails = reindex(transform(ofKind(sp, "mail"), s => mk(11, "mail",
      concat(lit("Link: "), s.getField("text"),
        lit(", valid: True (checked SMTP server: False, verified existence: False)")), 0.8)))

    concat(huge, inlineDup, meta, scripts, imgs, mails)
  }

  /** Mail defect description twin for the oracle. */
  def mailEvidence(addr: String): String =
    s"Link: $addr, valid: True (checked SMTP server: False, verified existence: False)"
}
