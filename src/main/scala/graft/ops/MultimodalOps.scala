package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata alongside. The Spark
  * side — schema, batching, partition sizing, UDF signatures — is real
  * and tested; the actual codec work is STUBBED (no image/audio
  * libraries in this container) behind [[StubCodec]], clearly marked,
  * with deterministic fake outputs so pipelines exercise realistic
  * shapes end-to-end.
  */
object MultimodalOps {

  /** Magic-byte container sniffing — real (pure expressions over the
    * binary prefix; the operator every media pipeline runs first).
    */
  def detectFormat(bin: Column): Column = {
    val head = hex(substring(bin, 1, 8))
    when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("47494638"), "gif")
      .when(head.startsWith("52494646"), "riff") // wav/avi/webp envelope
      .when(head.startsWith("494433") || head.startsWith("FFFB"), "mp3")
      .when(substring(bin, 5, 4).cast("string") === "ftyp", "mp4")
      .otherwise("unknown")
  }

  /** Typed metadata struct computed without decoding. */
  def mediaMeta(bin: Column): Column = struct(
    length(bin).as("n_bytes"),
    detectFormat(bin).as("format"),
    xxhash64(bin).as("content_hash"))

  /** ======== STUBBED CODEC LAYER ======================================
    * In production these run a real decoder inside mapInArrow/Pandas-UDF
    * batches; here the decode is a deterministic fake keyed on the
    * content hash, so downstream plumbing (schemas, batch shapes,
    * partition sizing) is fully exercised and reproducible.
    */
  object StubCodec {
    /** STUB: pretend-decode image dimensions from a hash (real impl:
      * ImageIO/libvips in a mapInArrow batch).
      */
    def decodeDims(hash: Long): (Int, Int) =
      (64 + math.floorMod(hash, 1024).toInt, 64 + math.floorMod(hash >> 10, 1024).toInt)

    /** STUB: pretend feature vector (real impl: vision encoder batch). */
    def embed(hash: Long, dim: Int): Array[Float] =
      Array.tabulate(dim) { i =>
        val h = graft.synth.WorldGen.mix(hash, i.toLong)
        (math.floorMod(h, 2001L) - 1000L).toFloat / 1000.0f
      }
  }

  case class MediaRow(id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, embedding: Array[Float])

  /** Decode + feature-extract as a typed batch map. Partition-parallel,
    * constant memory per batch — the Dataset shape a real
    * mapInArrow/mapInPandas decode stage has. Codec calls are the stub.
    */
  def decodeAndEmbed(df: DataFrame, idCol: String, binCol: String,
      embeddingDim: Int = 16): Dataset[MediaRow] = {
    val spark = df.sparkSession
    implicit val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long"), col(binCol),
        length(col(binCol)).cast("long"), detectFormat(col(binCol)),
        xxhash64(col(binCol)))
      .as[(Long, Array[Byte], Long, String, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY, Encoders.scalaLong,
          Encoders.STRING, Encoders.scalaLong))
      .map { case (id, _, n, fmt, hash) =>
        val (w, h) = StubCodec.decodeDims(hash)
        MediaRow(id, n, fmt, w, h, StubCodec.embed(hash, embeddingDim))
      }
  }

  /** Frame sampling plan for video-ish payloads: which byte offsets a
    * real demuxer would sample for k frames — the partition/batch math
    * is the real part, computed as expressions.
    */
  def frameSamplePlan(bin: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => floor(length(bin).cast("long") * i.cast("long") / lit(k.toLong)).cast("long"))
}
