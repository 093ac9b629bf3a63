package graft.checkpoint

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot layout on plain Parquet (SURVEY.md §1.4, §7):
  * ONE merged `delta` table per round (`<root>/round=K/delta/`) tagged
  * with a `kind` discriminator column, plus a `MANIFEST.json` written
  * atomically (tmp + move) as the commit marker — a round without a
  * manifest is invisible, so a killed job resumes from the last
  * complete round exactly (north-rule resumability). The manifest
  * carries the driver's scalar counters and per-partition lineage.
  *
  * Round 1 wrote 8 separate tables per round; at ~1s of fixed
  * job-launch + planning + commit latency per write that serial cost
  * dominated the whole round and flattened the core-scaling curve.
  * The merged delta is ONE write job per round; readers filter on
  * `kind` (parquet row-group stats prune, since the union lays kinds
  * out contiguously).
  *
  * The `TableFormat`-shaped interface is deliberately narrow so an
  * iceberg-spark-runtime implementation can slot in unchanged (no
  * Iceberg jar ships in /opt/spark/jars).
  */
object SnapshotStore {

  /** Superset schema of the merged per-round delta. */
  val deltaFields: Seq[(String, DataType)] = Seq(
    "kind" -> StringType, "round" -> IntegerType,
    // frontier / accepted / transactions family
    "seq" -> LongType, "pos" -> LongType, "uri" -> StringType,
    "origUri" -> StringType, "depth" -> IntegerType, "srcSeq" -> LongType,
    "method" -> StringType, "expected" -> StringType, "referer" -> StringType,
    "canon" -> StringType, "decoded" -> StringType,
    "responseStatus" -> IntegerType, "contentType" -> StringType,
    "verificationStatus" -> StringType,
    // links
    "fromSeq" -> LongType, "toUri" -> StringType, "toSeq" -> LongType,
    "createdAtPop" -> LongType,
    // defects
    "popPos" -> LongType, "phase" -> IntegerType, "responseSeq" -> LongType,
    "typeName" -> StringType, "evidence" -> StringType,
    "severity" -> DoubleType, "sub" -> IntegerType,
    // host_state
    "host" -> StringType, "lastVisitS" -> DoubleType,
    // dup_state (uri shared above)
    "size" -> LongType, "bhash" -> LongType, "pop" -> LongType,
    // headers (G4)
    "hname" -> StringType, "hvalue" -> StringType,
    // cookies (G5)
    "cname" -> StringType, "cvalue" -> StringType,
    "csecure" -> BooleanType, "chttpOnly" -> BooleanType,
    "cpath" -> StringType,
    // lineage
    "metric" -> StringType, "partition" -> IntegerType, "count" -> LongType)

  /** Projects `df` onto the superset schema with `kind`/`round` tags. */
  def asDelta(kind: String, round: Int, df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val cols: Seq[Column] = deltaFields.map {
      case ("kind", _) => lit(kind).as("kind")
      case ("round", _) => lit(round).as("round")
      case (c, _) if present(c) => col(c)
      case (c, t) => lit(null).cast(t).as(c)
    }
    df.select(cols: _*)
  }
}

class SnapshotStore(val root: String, spark: SparkSession) {

  case class Counters(round: Int, nextSeq: Long, nextPos: Long,
      popBase: Long, seenCount: Long, frontierCount: Long)

  private def roundDir(k: Int): Path = Paths.get(root, s"round=$k")
  private def deltaDir(k: Int): String = roundDir(k).resolve("delta").toString

  /** One parquet write per round — the only durable I/O of the loop. */
  def writeDelta(k: Int, delta: DataFrame): Unit =
    delta.write.mode("overwrite").parquet(deltaDir(k))

  def readDelta(k: Int): DataFrame = spark.read.parquet(deltaDir(k))

  /** Rows of one `kind` in round k (parquet filter pushdown on kind). */
  def kindOf(k: Int, kind: String): DataFrame =
    readDelta(k).filter(col("kind") === kind)

  /** Rows of one `kind` across rounds −1 (bootstrap)..k (empty-safe). */
  def kindUnion(k: Int, kind: String): Option[DataFrame] = {
    val dirs = (-1 to k).map(i => Paths.get(deltaDir(i)))
      .filter(p => Files.exists(p)).map(_.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).filter(col("kind") === kind))
  }

  /** Commit a round: MANIFEST.json written last, atomically. */
  def commit(k: Int, counters: Counters, lineage: Seq[(String, Int, Long)]): Unit = {
    val lineageJson = lineage.map { case (m, p, c) =>
      s"""{"metric":"$m","partition":$p,"count":$c}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"round":${counters.round},"nextSeq":${counters.nextSeq},
         |"nextPos":${counters.nextPos},"popBase":${counters.popBase},
         |"seenCount":${counters.seenCount},"frontierCount":${counters.frontierCount},
         |"lineage":$lineageJson}""".stripMargin.replace("\n", "")
    val dir = roundDir(k)
    Files.createDirectories(dir)
    val tmp = dir.resolve(".MANIFEST.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, dir.resolve("MANIFEST.json"), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Latest committed round, if any. */
  def latestCommitted(): Option[Int] = {
    val r = Paths.get(root)
    if (!Files.exists(r)) return None
    val rounds = Files.list(r).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("round="))
      .filter(p => Files.exists(p.resolve("MANIFEST.json")))
      .map(_.getFileName.toString.stripPrefix("round=").toInt)
      .toSeq
    if (rounds.isEmpty) None else Some(rounds.max)
  }

  /** Per-partition lineage rows of a committed round's manifest. */
  def readLineage(k: Int): Seq[(String, Int, Long)] = {
    val json = Files.readString(roundDir(k).resolve("MANIFEST.json"))
    """\{"metric":"([^"]+)","partition":(-?\d+),"count":(-?\d+)\}""".r
      .findAllMatchIn(json)
      .map(m => (m.group(1), m.group(2).toInt, m.group(3).toLong)).toSeq
  }

  def readCounters(k: Int): Counters = {
    val json = Files.readString(roundDir(k).resolve("MANIFEST.json"))
    def l(key: String): Long =
      s""""$key":(-?\\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    Counters(l("round").toInt, l("nextSeq"), l("nextPos"), l("popBase"),
      l("seenCount"), l("frontierCount"))
  }
}
