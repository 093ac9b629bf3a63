package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-6 measurement sidecar (guide §1.4/§1.5): times declared queries
  * in a session configured EXACTLY like Bench's query session (local
  * [$SPARK_GRAFT_CPUS], same confs) with both the driver's `.count()`
  * action and the noop sink, and dumps `.explain("formatted")` per query
  * to plans/r06/. Also reconstructs the PRE-round-6 expression forms of
  * the queries whose change was expression-level (the HOF spec twins are
  * bit-for-bit pinned, so the "before" plans are faithful).
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCHX_QS (comma list or
  * "all"), BENCHX_PLANS=1 to write plan files, BENCHX_NOOP=1 to also
  * time the noop-sink action.
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchx-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.autoBroadcastJoinThreshold", "10485760")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The pre-round-6 HOF forms of the expression-level rewrites, for
    * honest `_before` plans (values bit-for-bit equal by OpsSpec).
    */
  private def beforeForms(s: SparkSession, dir: String): Map[String, DataFrame] = {
    def t(name: String) = s.read.parquet(s"$dir/$name.parquet")
    import graft.ops.{DedupOps, TextOps}
    val docs = t("documents")
    val base = docs.filter(col("doc_id") === 0)
      .select(DedupOps.shinglesHof(col("text"), 2).as("shB"))
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "that", "for", "on", "with", "as", "was", "at", "by")
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
      "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
      "es" -> Seq("el", "la", "los", "que", "es", "no", "por", "una", "para", "con"),
      "it" -> Seq("il", "la", "che", "di", "non", "per", "una", "sono", "con", "del"))
    val tokens = split(lower(col("text")), "\\s+")
    val scored = profiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(size(filter(tokens, tk => tk.isin(words: _*))).as("hits"),
        lit(-i).as("prio"), lit(lang).as("lang"))
    }
    val best = element_at(array_sort(array(scored: _*)), -1)
    Map(
      "dd_ngram_jaccard" -> docs.crossJoin(broadcast(base))
        .select(col("doc_id"),
          round(DedupOps.jaccardHof(DedupOps.shinglesHof(col("text"), 2), col("shB")), 6)
            .as("jaccard2"))
        .filter(col("jaccard2") > 0).orderBy(col("doc_id")),
      "dd_simhash_pairs" -> {
        // simhashNearDups with the HOF sketch inlined (pre-r6 shape)
        val sk = docs.select(col("doc_id").as("id"),
          DedupOps.simhash64Hof(col("text")).as("sim"))
        val banded = sk.select(col("id"), col("sim"),
          posexplode(transform(sequence(lit(0), lit(3)),
            b => call_function("shiftright", col("sim"), b * 16).bitwiseAND(0xffffL))))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
        val capped = banded.withColumn("__n",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("band"), col("chunk"))))
          .filter(col("__n") > 1 && col("__n") <= 5000).drop("__n")
        val l = capped.select(col("band"), col("chunk"), col("id").as("idA"), col("sim").as("simA"))
        val r = capped.select(col("band"), col("chunk"), col("id").as("idB"), col("sim").as("simB"))
        l.join(r, Seq("band", "chunk")).filter(col("idA") < col("idB"))
          .dropDuplicates("idA", "idB")
          .withColumn("hamming", graft.ops.DedupOps.hamming64(col("simA"), col("simB")))
          .filter(col("hamming") <= 6)
          .select(col("idA"), col("idB"), col("hamming"))
          .orderBy(col("idA"), col("idB"))
      },
      "tx_lang_id" -> docs
        .select(when(best.getField("hits") > 0, best.getField("lang"))
          .otherwise("und").as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred")),
      "tx_quality_stopratio" -> docs.select(col("doc_id"),
        (size(filter(split(lower(col("text")), "\\s+"),
          w => w.isin(stop: _*))).cast("double") /
          greatest(size(split(trim(col("text")), "\\s+")).cast("double"), lit(1.0)))
          .as("stopword_ratio")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val wantPlans = sys.env.getOrElse("BENCHX_PLANS", "0") == "1"
    val wantNoop = sys.env.getOrElse("BENCHX_NOOP", "0") == "1"
    val qsel = sys.env.getOrElse("BENCHX_QS", "all")
    val spark = session(cpus)
    val names =
      if (qsel == "all") SparkEntry.queries.keys.toSeq.sorted
      else qsel.split(",").map(_.trim).toSeq
    val plansDir = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(plansDir)
    def dumpPlan(tag: String, df: DataFrame): Unit = if (wantPlans) {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(plansDir.resolve(s"$tag.txt"),
        txt.getBytes("UTF-8"))
    }
    // before-forms first (plans only — they are the superseded shapes)
    if (wantPlans)
      for ((name, df) <- beforeForms(spark, sfDir))
        dumpPlan(s"${name}_before", df)
    for (name <- names) {
      spark.sparkContext.setJobDescription(s"benchx: $name")
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = try fn(spark, sfDir) catch {
        case e: Throwable =>
          println(f"BX $name%-24s FAILED ${e.getMessage}")
          null
      }
      if (df != null) {
        val n = df.count()
        val tCount = (System.nanoTime() - t0) / 1e9
        val noopSec = if (wantNoop) {
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t1) / 1e9
        } else -1.0
        dumpPlan(s"${name}_after", df)
        println(f"BX $name%-24s rows=$n%7d count=$tCount%6.2fs" +
          (if (wantNoop) f" noop=$noopSec%6.2fs" else ""))
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
