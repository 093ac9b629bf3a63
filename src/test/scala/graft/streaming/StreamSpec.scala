package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the continuous-ingest operators: what distinguishes them
  * from their batch twins is STATE ACROSS MICRO-BATCHES — every test
  * feeds ≥2 batches and asserts the second batch is governed by the
  * first one's state.
  */
class StreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("streaming dedup suppresses duplicates across micro-batches within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val df = ms.toDF().toDF("doc_id", "text", "tsec")
      .withColumn("event_time", timestamp_seconds(col("tsec")))
    val ckpt = Files.createTempDirectory("stream-dedup-ckpt").toString
    val q = StreamOps.dedupStream(df, Seq("text"), "event_time", "1 hour")
      .writeStream.format("memory").queryName("st_dedup_test")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      ms.addData((0L, "alpha", 100L), (1L, "beta", 100L), (2L, "alpha", 100L))
      q.processAllAvailable()
      // batch 2: "alpha" is a cross-batch duplicate (inside the 1h
      // window) — suppressed by state, not by within-batch dedup
      ms.addData((3L, "alpha", 130L), (4L, "gamma", 130L))
      q.processAllAvailable()
    } finally q.stop()
    val texts = spark.table("st_dedup_test").select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("alpha", "beta", "gamma"),
      s"each text must appear exactly once: $texts")
  }

  test("hostThrottle reproduces the serial politeness recurrence; state carries across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[FetchReq]
    val ckpt = Files.createTempDirectory("stream-throttle-ckpt").toString
    val q = StreamOps.hostThrottle(ms.toDS(), delayMs = 1000L)
      .writeStream.format("memory").queryName("st_throttle_test")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // batch 1: host a back-to-back at t=0,100 (second must wait for
      // the 1000 ms gap); host b one request
      ms.addData(FetchReq("a", "u1", 0L), FetchReq("a", "u2", 100L),
        FetchReq("b", "u3", 0L))
      q.processAllAvailable()
      // batch 2: a's request at t=5000 is past its backlog (dispatches
      // at its own t); b's request at t=500 is throttled by BATCH 1's
      // deadline (0 + 1000) — the state-carry assertion
      ms.addData(FetchReq("a", "u4", 5000L), FetchReq("b", "u5", 500L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st_throttle_test")
      .collect().map(r => (r.getString(1), r.getLong(3))).toMap
    val want = Map("u1" -> 0L, "u2" -> 1000L, "u3" -> 0L,
      "u4" -> 5000L, "u5" -> 1000L)
    assert(got == want, s"schedules must match the serial recurrence: $got")
  }
}
