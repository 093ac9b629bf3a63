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

  /** Per-page checker defects for OK text/html rows. Input columns:
    * pos, seq, spansSorted. Output: popPos, phase, responseSeq,
    * typeName, evidence, severity.
    */
  def pageDefects(okHtml: DataFrame): Seq[DataFrame] = {
    import org.apache.spark.sql.types.StringType
    val sp = col("spansSorted")
    def out(df: DataFrame, phase: Int, name: String, evidence: Column, sev: Double): DataFrame =
      df.select(col("pos").as("popPos"), lit(phase).as("phase"), col("seq").as("responseSeq"),
        lit(name).as("typeName"), evidence.cast(StringType).as("evidence"),
        lit(sev).as("severity"))

    // css_scraper internal <style> (css_scraper.py:52-60): first block
    val cssInt = try_element_at(ofKind(sp, "css-int"), lit(1))
    val huge = out(
      okHtml.withColumn("cssLen", octet_length(cssInt.getField("text")))
        .filter(col("cssLen").isNotNull && col("cssLen") > 1024),
      5, "seo:huge_internal", col("cssLen"), 0.5)

    // css_scraper inline dups (css_scraper.py:62-68): every repeat of a
    // style value after its first in-page occurrence
    val styleRows = okHtml.select(col("pos"), col("seq"),
      posexplode(ofKind(sp, "style")).as(Seq("sIdx", "span")))
      .withColumn("v", col("span").getField("text"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("seq"), col("v")).orderBy(col("sIdx"))))
      .filter(col("rn") >= 2)
    val inlineDup = out(styleRows, 6, "seo:duplicit_inline", col("v"), 0.1)

    // seo_meta (seo_meta.py:24-49): counts of description / keywords
    def metaCount(name: String): Column =
      size(filter(ofKind(sp, "meta"), s => s.getField("text") === name))
    val withCounts = okHtml.withColumn("nDesc", metaCount("description"))
      .withColumn("nKeys", metaCount("keywords"))
    val nodsc = out(withCounts.filter(col("nDesc") === 0), 7, "seo:nodsc", lit(""), 0.4)
    val multidsc = out(withCounts.filter(col("nDesc") > 1), 7, "seo:multidsc", col("nDesc"), 0.4)
    val nokeys = out(withCounts.filter(col("nKeys") === 0), 8, "seo:nokeys", lit(""), 0.4)
    val multikeys = out(withCounts.filter(col("nKeys") > 1), 8, "seo:multikeys", col("nKeys"), 0.4)

    // no_script (no_script.py:17-30): per script span, two conditions
    val scriptRows = okHtml.select(col("pos"), col("seq"),
      explode(ofKind(sp, "script")).as("span"))
      .withColumn("v", col("span").getField("text"))
    val noscriptMiss = out(scriptRows.filter(!col("v").contains("noscript")),
      9, "noscript-miss", concat(lit("Script: "), col("v")), 0.7)
    val noComment = out(scriptRows.filter(!col("v").contains("comment")),
      9, "script-no-comment", concat(lit("Script: "), col("v")), 0.4)

    // seo_images (seo_images.py:22-37): img spans; media_ref carries the
    // width/height attribute flags in the span model
    val imgRows = okHtml.select(col("pos"), col("seq"),
      explode(ofKind(sp, "img")).as("span"))
      .withColumn("src", col("span").getField("text"))
      .withColumn("flags", coalesce(col("span").getField("media_ref"), lit("")))
    val noWidth = out(imgRows.filter(!col("flags").contains("w")),
      10, "seo:img:nowidth", col("src"), 0.6)
    val noHeight = out(imgRows.filter(!col("flags").contains("h")),
      10, "seo:img:noheight", col("src"), 0.6)

    // mailer (mailer.py:27-50), default config: mailto links only
    val mailRows = okHtml.select(col("pos"), col("seq"),
      explode(ofKind(sp, "mail")).as("span"))
      .withColumn("addr", col("span").getField("text"))
    val mail = out(mailRows, 11, "mail",
      concat(lit("Link: "), col("addr"),
        lit(", valid: True (checked SMTP server: False, verified existence: False)")), 0.8)

    Seq(huge, inlineDup, nodsc, multidsc, nokeys, multikeys,
      noscriptMiss, noComment, noWidth, noHeight, mail)
  }

  /** Mail defect description twin for the oracle. */
  def mailEvidence(addr: String): String =
    s"Link: $addr, valid: True (checked SMTP server: False, verified existence: False)"
}
