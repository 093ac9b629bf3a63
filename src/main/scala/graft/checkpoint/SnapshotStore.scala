package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot layout on plain Parquet (SURVEY.md §1.4, §7):
  * `<root>/round=K/<table>/` parquet dirs plus a `MANIFEST.json` written
  * atomically (tmp + move) as the commit marker — a round without a
  * manifest is invisible, so a killed job resumes from the last complete
  * round exactly (north-rule resumability). The manifest carries the
  * driver's scalar counters and the per-partition lineage counts.
  *
  * The `TableFormat`-shaped interface is deliberately narrow so an
  * iceberg-spark-runtime implementation can slot in unchanged (no
  * Iceberg jar ships in /opt/spark/jars).
  */
class SnapshotStore(val root: String, spark: SparkSession) {

  case class Counters(round: Int, nextSeq: Long, nextPos: Long,
      popBase: Long, seenCount: Long, frontierCount: Long)

  private def roundDir(k: Int): Path = Paths.get(root, s"round=$k")

  def writeTable(k: Int, name: String, df: DataFrame): Unit = {
    val dir = roundDir(k).resolve(name).toString
    df.write.mode("overwrite").parquet(dir)
  }

  def readTable(k: Int, name: String): DataFrame =
    spark.read.parquet(roundDir(k).resolve(name).toString)

  /** Union of a delta table across rounds −1 (bootstrap)..k (empty-safe). */
  def readTableUnion(k: Int, name: String): Option[DataFrame] = {
    val dirs = (-1 to k).map(i => roundDir(i).resolve(name))
      .filter(p => Files.exists(p)).map(_.toString)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
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

  def readCounters(k: Int): Counters = {
    val json = Files.readString(roundDir(k).resolve("MANIFEST.json"))
    def l(key: String): Long =
      s""""$key":(-?\\d+)""".r.findFirstMatchIn(json).get.group(1).toLong
    Counters(l("round").toInt, l("nextSeq"), l("nextPos"), l("popBase"),
      l("seenCount"), l("frontierCount"))
  }
}
