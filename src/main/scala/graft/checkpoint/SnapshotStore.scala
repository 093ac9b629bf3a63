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
  * carries the driver's scalar counters plus per-metric lineage TOTALS
  * (derived from the write job's CollectMetrics observation, partition
  * recorded as 0 — totals-only): the per-partition split rides inside
  * the delta itself as `kind=lineage` rows, and the observed totals are
  * validated against the durably committed rows at every compaction
  * (CrawlDriver's seen-count invariant).
  *
  * Round 1 wrote 8 separate tables per round; at ~1s of fixed
  * job-launch + planning + commit latency per write that serial cost
  * dominated the whole round and flattened the core-scaling curve.
  * The merged delta is ONE write job per round; readers filter on
  * `kind` (parquet row-group stats prune, since the union lays kinds
  * out contiguously).
  *
  * The merged schema is PACKED: instead of a 47-column superset (one
  * named column per field of every kind, mostly null), kinds map their
  * fields onto 14 generic slots by type (4 longs, 6 strings, 2 ints,
  * 1 double, 2 booleans). Every written row carries 16 fields instead
  * of 47 — at 10^5..10^9 rows/round the union's row width is the write
  * job's memory traffic, and the wide layout measurably throttled the
  * multi-core scaling curve. [[asDelta]] packs named → slots;
  * [[kindOf]]/[[kindUnion]] unpack slots → names, so every reader
  * still sees its natural column names.
  *
  * The `TableFormat`-shaped interface is deliberately narrow so an
  * iceberg-spark-runtime implementation can slot in unchanged (no
  * Iceberg jar ships in /opt/spark/jars).
  */
object SnapshotStore {

  private val L = LongType; private val S = StringType; private val I = IntegerType
  private val D = DoubleType; private val B = BooleanType

  /** Generic slot columns of the packed delta. */
  val slotFields: Seq[(String, DataType)] = Seq(
    "l0" -> L, "l1" -> L, "l2" -> L, "l3" -> L,
    "s0" -> S, "s1" -> S, "s2" -> S, "s3" -> S, "s4" -> S, "s5" -> S,
    "i0" -> I, "i1" -> I, "d0" -> D, "b0" -> B, "b1" -> B)

  /** The packed delta's STATIC schema, passed to every read: parquet
    * schema inference (a footer read, sometimes a small driver job over
    * many files) never runs on the per-round read path.
    */
  val packedSchema: StructType = StructType(
    StructField("kind", S) +: StructField("round", I) +:
      slotFields.map { case (n, t) => StructField(n, t) })

  /** Per-kind field layout: (named column, its type) in slot-assignment
    * order (longs fill l0.., strings s0.., ints i0.., doubles d0..,
    * booleans b0..). Adding a kind = adding a row here.
    */
  private val kindFields: Map[String, Seq[(String, DataType)]] = Map(
    "frontier" -> Seq("seq" -> L, "pos" -> L, "srcSeq" -> L,
      "uri" -> S, "origUri" -> S, "method" -> S, "expected" -> S,
      "referer" -> S, "dataQ" -> S, "depth" -> I),
    "accepted" -> Seq("seq" -> L,
      "method" -> S, "canon" -> S, "decoded" -> S, "expected" -> S, "depth" -> I),
    "transactions" -> Seq("seq" -> L,
      "method" -> S, "uri" -> S, "contentType" -> S, "verificationStatus" -> S,
      "expected" -> S, "responseStatus" -> I, "depth" -> I),
    "links" -> Seq("fromSeq" -> L, "toSeq" -> L, "createdAtPop" -> L, "toUri" -> S),
    "defects" -> Seq("popPos" -> L, "responseSeq" -> L,
      "typeName" -> S, "evidence" -> S, "phase" -> I, "sub" -> I, "severity" -> D),
    "host_state" -> Seq("host" -> S, "lastVisitS" -> D),
    "dup_state" -> Seq("size" -> L, "bhash" -> L, "bhash2" -> L, "pop" -> L,
      "uri" -> S),
    "known_maps" -> Seq("uri" -> S),
    "headers" -> Seq("seq" -> L, "hname" -> S, "hvalue" -> S),
    "cookies" -> Seq("seq" -> L, "cname" -> S, "cvalue" -> S, "cpath" -> S,
      "csecure" -> B, "chttpOnly" -> B),
    "params" -> Seq("seq" -> L, "pkey" -> S, "pvalue" -> S),
    "lineage" -> Seq("count" -> L, "metric" -> S, "partition" -> I))

  /** Slot name per (kind, named column). */
  private def slotAssignment(kind: String): Seq[(String, String, DataType)] = {
    val counters = scala.collection.mutable.Map[Char, Int]().withDefaultValue(0)
    kindFields(kind).map { case (name, t) =>
      val prefix = t match {
        case LongType => 'l'
        case StringType => 's'
        case IntegerType => 'i'
        case DoubleType => 'd'
        case BooleanType => 'b'
        case other => throw new IllegalArgumentException(s"unsupported $other")
      }
      val idx = counters(prefix); counters(prefix) = idx + 1
      (name, s"$prefix$idx", t)
    }
  }

  /** Packs `df`'s named columns into the generic slot schema with
    * `kind`/`round` tags. Missing named columns become null slots.
    */
  def asDelta(kind: String, round: Int, df: DataFrame): DataFrame = {
    val assign = slotAssignment(kind)
    val present = df.columns.toSet
    val bySlot: Map[String, Column] = assign.map { case (name, slot, t) =>
      slot -> (if (present(name)) col(name).cast(t) else lit(null).cast(t))
    }.toMap
    val cols: Seq[Column] = lit(kind).as("kind") +: graft.plans.Dyn.dynInt(round).as("round") +:
      slotFields.map { case (slot, t) =>
        bySlot.getOrElse(slot, lit(null).cast(t)).as(slot)
      }
    df.select(cols: _*)
  }

  /** Unpacks a packed frame's slots back to `kind`'s named columns
    * (keeps `round`).
    */
  def unpack(kind: String, packed: DataFrame): DataFrame = {
    val cols: Seq[Column] = slotAssignment(kind).map { case (name, slot, _) =>
      col(slot).as(name)
    } :+ col("round")
    packed.select(cols: _*)
  }
}

class SnapshotStore(val root: String, spark: SparkSession) {
  import SnapshotStore.unpack

  case class Counters(round: Int, nextSeq: Long, nextPos: Long,
      popBase: Long, seenCount: Long, frontierCount: Long)

  private def roundDir(k: Int): Path = Paths.get(root, s"round=$k")
  private def deltaDir(k: Int): String = roundDir(k).resolve("delta").toString

  /** One parquet write per round — the only durable I/O of the loop. */
  def writeDelta(k: Int, delta: DataFrame): Unit =
    delta.write.mode("overwrite").parquet(deltaDir(k))

  def readDelta(k: Int): DataFrame =
    spark.read.schema(SnapshotStore.packedSchema).parquet(deltaDir(k))

  /** Rows of one `kind` in round k, with the kind's named columns
    * (parquet filter pushdown on the leading kind column).
    */
  def kindOf(k: Int, kind: String): DataFrame =
    unpack(kind, readDelta(k).filter(col("kind") === kind))

  /** Rows of one `kind` across rounds −1 (bootstrap)..k (empty-safe). */
  def kindUnion(k: Int, kind: String): Option[DataFrame] = {
    val dirs = (-1 to k).map(i => Paths.get(deltaDir(i)))
      .filter(p => Files.exists(p)).map(_.toString)
    if (dirs.isEmpty) None
    else Some(unpack(kind,
      spark.read.schema(SnapshotStore.packedSchema).parquet(dirs: _*)
        .filter(col("kind") === kind)))
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

  /** Lineage (metric, partition, total) rows of a committed round's
    * manifest — totals-only since the Observation fast path (partition
    * is always 0); per-partition detail lives in the round's
    * `kind=lineage` delta rows. */
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
