package graft.frontier

import graft.checkpoint.SnapshotStore
import graft.model._
import graft.seen.UrlSeen
import graft.url.UrlFuncs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BSP crawl loop: one [[CrawlRound]] per iteration, each committed as a
  * snapshot (SURVEY.md §2.11); resume loads the last complete snapshot.
  * Driver state is O(1) scalars — frontier/seen/outputs never collect.
  */
object CrawlDriver {

  case class CrawlRun(store: SnapshotStore, lastRound: Int, spark: SparkSession) {
    private def union(name: String): DataFrame =
      store.readTableUnion(lastRound, name).get
    /** accepted-URL delta (seq, method, canon, decoded, depth, expected,
      * round) — the seen set, aliases and REQUESTED rows project off it.
      */
    def accepted: DataFrame = union("accepted")
    /** crawl order ≡ the popped frontiers: round k pops frontier(k−1),
      * and popPos ≡ pos (§3.2) — no separate table needed.
      */
    def crawlOrder: DataFrame =
      store.readTableUnion(lastRound - 1, "frontier").get
        .select(col("pos").as("popPos"), col("seq"), col("uri"))
    def links: DataFrame = union("links")
    def defects: DataFrame = union("defects")
    def aliases: DataFrame = accepted.select(col("seq"), col("decoded").as("uri"))
    def seen: DataFrame =
      accepted.select(col("canon").as("uri"), col("method"), col("seq"))
    def hostState: DataFrame = store.readTable(lastRound, "host_state")
    /** transactions: latest row per seq wins (REQUESTED → DONE-*). */
    def transactions: DataFrame = {
      val requested = accepted.select(col("seq"), col("method"),
        col("canon").as("uri"),
        lit(null).cast("int").as("responseStatus"),
        lit(null).cast("string").as("contentType"),
        lit(VerificationStatus.Requested).as("verificationStatus"),
        col("depth"), col("expected"), col("round"))
      val all = union("transactions").unionByName(requested)
      all.withColumn("rn", row_number().over(
          Window.partitionBy(col("seq")).orderBy(col("round").desc)))
        .filter(col("rn") === 1).drop("rn", "round")
    }
    /** link processed flag (transaction.py:146-147): a link row is
      * processed iff its target was popped after the row was created.
      */
    def linksWithProcessed: DataFrame = {
      val pops = crawlOrder.groupBy(col("uri").as("toUri"))
        .agg(max(col("popPos")).as("lastPop"))
      links.join(pops, Seq("toUri"), "left")
        .withColumn("processed",
          col("lastPop").isNotNull && col("lastPop") > col("createdAtPop"))
        .select("fromSeq", "toUri", "toSeq", "processed")
    }
  }

  /** Seed bootstrap = round "-1": replicates push(createTransaction(seed))
    * for each configured entry point in order (core.py:55-61) — tiny,
    * driver-side, exactly the oracle's seed path.
    */
  private def bootstrap(spark: SparkSession, cfg: CrawlConfig, store: SnapshotStore): Unit = {
    import spark.implicits._
    var nextSeq = 0L
    var nextPos = 0L
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val items = scala.collection.mutable.ArrayBuffer.empty[FrontierEntry]
    val aliases = scala.collection.mutable.ArrayBuffer.empty[AliasRow]
    for (seed <- cfg.seeds) {
      val decoded = UrlFuncs.unquote2(seed)
      val seq = nextSeq; nextSeq += 1
      val canon = UrlFuncs.defrag(decoded)
      if (!seen.contains(canon) && !cfg.urlLimit.exists(seen.size >= _)) {
        seen(canon) = seq
        items += FrontierEntry(seq, nextPos, canon, 0, -1L, "GET", None)
        aliases += AliasRow(seq, decoded)
        nextPos += 1
      }
    }
    val frontier = items.toSeq.map(i =>
        (i.seq, i.pos, i.uri, i.uri, i.depth, i.srcSeq, i.method, i.expected.orNull))
      .toDF("seq", "pos", "uri", "origUri", "depth", "srcSeq", "method", "expected")
    store.writeTable(-1, "frontier", frontier)
    store.writeTable(-1, "accepted", items.toSeq.zip(aliases).map { case (i, a) =>
        (i.seq, i.method, i.uri, a.uri, i.depth, i.expected.orNull, -1)
      }.toDF("seq", "method", "canon", "decoded", "depth", "expected", "round"))
    store.writeTable(-1, "host_state", spark.emptyDataset[HostState].toDF())
    store.commit(-1, store.Counters(-1, nextSeq, nextPos, 0L, seen.size.toLong,
      items.size.toLong), Seq(("seeds", 0, items.size.toLong)))
  }

  /** Run (or resume) a crawl; returns a handle over the snapshot dirs. */
  def crawl(spark: SparkSession, world0: CrawlRound.WorldDF, cfg: CrawlConfig,
      checkpointDir: String, useBloom: Boolean = true,
      bloomMinSeen: Long = 100000L): CrawlRun = {
    val store = new SnapshotStore(checkpointDir, spark)
    if (store.latestCommitted().isEmpty) bootstrap(spark, cfg, store)
    // round-invariant world prep (redirect-resolved fetch map, robots
    // aggregation), cached once and shared by every round
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val prepped0 = CrawlRound.prepare(world0)
    val world = CrawlRound.PreparedWorld(
      prepped0.docs.persist(MEMORY_AND_DISK),
      prepped0.fetchMap.persist(MEMORY_AND_DISK),
      prepped0.hosts.persist(MEMORY_AND_DISK),
      prepped0.rulesAgg.persist(MEMORY_AND_DISK))

    var last = store.latestCommitted().get
    var c = store.readCounters(last)
    while (c.frontierCount > 0 && (cfg.maxRounds <= 0 || c.round + 1 < cfg.maxRounds)) {
      val round = c.round + 1
      val frontier = store.readTable(last, "frontier")
      val seen = store.readTableUnion(last, "accepted").get
        .select(col("canon").as("uri"), col("method"), col("seq"))
      val hostState = store.readTable(last, "host_state")
      val dupState = store.readTableUnion(last, "dup_state").getOrElse {
        import spark.implicits._
        spark.emptyDataset[(Long, Long, Long, String)]
          .toDF("size", "bhash", "pop", "uri")
      }
      val bloom =
        if (useBloom && c.seenCount >= math.max(bloomMinSeen, 1L))
          Some(UrlSeen.buildBloom(seen, UrlSeen.seenKey(col("uri"), col("method")),
            expectedItems = math.max(c.seenCount * 2, 1024L)))
        else None
      val out = CrawlRound.run(spark, world, cfg,
        CrawlRound.RoundIn(round, frontier, seen, hostState, dupState,
          c.nextSeq, c.nextPos, c.seenCount, c.nextPos - c.frontierCount, bloom))

      val trace = sys.env.contains("SPARK_GRAFT_TRACE")
      def timedWrite(name: String, df: DataFrame): Unit = {
        val t = System.nanoTime()
        store.writeTable(round, name, df)
        if (trace) println(f"[w $round $name] ${(System.nanoTime() - t) / 1e9}%.1fs")
      }
      val tW0 = System.nanoTime()
      timedWrite("frontier", out.frontierOut)
      val tW1 = System.nanoTime()
      timedWrite("accepted", out.accepted)
      timedWrite("transactions", out.txDelta)
      timedWrite("links", out.links)
      timedWrite("defects", out.defects)
      timedWrite("host_state", out.hostStateOut)
      timedWrite("dup_state", out.dupStateDelta)
      timedWrite("lineage", out.lineage)
      val tW2 = System.nanoTime()
      val lineageRows = store.readTable(round, "lineage").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      out.cached.foreach(_.unpersist(blocking = false))
      def metric(name: String): Long = lineageRows.filter(_._1 == name).map(_._3).sum
      // every scheme-passing link consumed a seq (dups and over-limit
      // drops included) — the "discovered" lineage metric counts exactly
      // those (kids2), so it advances the idno counter
      val discovered = metric("discovered")
      val frontierCount = metric("frontierOut")
      val acceptedCount = metric("deduped")
      val popped = metric("frontierIn")

      c = store.Counters(round,
        nextSeq = c.nextSeq + discovered,
        nextPos = c.nextPos + frontierCount,
        popBase = c.popBase + popped,
        seenCount = c.seenCount + acceptedCount,
        frontierCount = frontierCount)
      store.commit(round, c, lineageRows)
      if (sys.env.contains("SPARK_GRAFT_TRACE"))
        println(f"[round $round] frontierIn=$popped fetched=${metric("fetched")} " +
          f"frontierWrite=${(tW1 - tW0) / 1e9}%.1fs otherWrites=${(tW2 - tW1) / 1e9}%.1fs " +
          f"lineage+rest=${(System.nanoTime() - tW2) / 1e9}%.1fs")
      last = round
    }
    CrawlRun(store, last, spark)
  }
}
