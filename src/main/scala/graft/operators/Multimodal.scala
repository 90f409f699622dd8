package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.5): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct, and
  * decode / feature-extract / frame-sample run as batched per-partition
  * transforms — the Scala analogue of `mapInPandas` (an iterator of
  * fixed-size batches per partition, explicit output schema, nothing on
  * the driver).
  *
  * The actual media codecs are NOT in this container, so the decode step
  * is a clearly-marked deterministic STUB (`decodeStub`): it derives fake
  * width/height/checksum from the raw bytes. Everything around it — the
  * binary schema, the partition-iterator batch shape, the explicit result
  * encoder, the flat (exploded) frame output — is the real pipeline and
  * is oracle-tested byte-for-byte.
  */
object Multimodal {

  /** Bytes per synthetic "frame" for the frame-sample stub. */
  val FrameBytes = 64

  /** Batch size for the per-partition iterator — the `mapInPandas`
    * batch-shape analogue; a real decoder would vectorize over this.
    */
  val BatchSize = 64

  /** Attach a binary payload + typed metadata struct to a text table,
    * standing in for a real media column (deterministic: payload =
    * UTF-8 bytes of the text).
    */
  def attachBinary(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("fake/binary").as("format"),
        octet_length(col("payload")).cast("long").as("n_bytes")))

  /** STUB decode: a real implementation would hand `bytes` to an image
    * or audio codec here. The stub derives deterministic fake dimensions
    * and a byte checksum so the surrounding plumbing stays testable.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    val n = bytes.length
    var checksum = 0L
    var i = 0
    while (i < n) { checksum += bytes(i) & 0xFF; i += 1 }
    (n % 320 + 1, n % 240 + 1, checksum)
  }

  /** Batched per-partition decode of (`idCol`, payload) → flat metadata
    * row (id, width, height, checksum). Runs as `mapPartitions` with an
    * explicit row encoder: no shuffle, no driver round-trip, batches of
    * [[BatchSize]] rows exactly like a Pandas-UDF batch.
    */
  def decodeBatch(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val src = df.select(col(idCol).cast("long"), col("payload"))
    src.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, cs) = decodeStub(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), w, h, cs)
        }
      }
    }(Encoders.row(schema))
  }

  /** DuckDB oracle for [[decodeBatch]] over ASCII text (byte value =
    * char code, so the checksum is the sum of `ascii(char)`).
    */
  def duckDecodeBatch(tbl: String, textCol: String, idCol: String): String =
    s"""SELECT CAST($idCol AS BIGINT) AS $idCol,
       |  CAST(length($textCol) % 320 + 1 AS INT) AS width,
       |  CAST(length($textCol) % 240 + 1 AS INT) AS height,
       |  CAST(coalesce(list_sum(list_transform(
       |    list_filter(string_split($textCol, ''), c -> c <> ''),
       |    c -> CAST(ascii(c) AS BIGINT))), 0) AS BIGINT) AS checksum
       |FROM $tbl""".stripMargin

  /** Frame sampling over a "video" payload: split the bytes into
    * [[FrameBytes]]-sized frames, keep every `step`-th frame, emit one
    * flat row per sampled frame with its checksum. Same batched
    * per-partition shape as [[decodeBatch]].
    */
  def frameSample(df: DataFrame, idCol: String, step: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_checksum", LongType, nullable = false)))
    val src = df.select(col(idCol).cast("long"), col("payload"))
    src.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val nFrames = (bytes.length + FrameBytes - 1) / FrameBytes
          (0 until nFrames by step).map { f =>
            val from = f * FrameBytes
            val until = math.min(from + FrameBytes, bytes.length)
            var cs = 0L
            var i = from
            while (i < until) { cs += bytes(i) & 0xFF; i += 1 }
            Row(r.getLong(0), f, cs)
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** DuckDB oracle for [[frameSample]] over ASCII text. */
  def duckFrameSample(tbl: String, textCol: String, idCol: String, step: Int): String =
    s"""SELECT CAST($idCol AS BIGINT) AS $idCol,
       |  CAST(f AS INT) AS frame_idx,
       |  CAST(list_sum(list_transform(
       |    list_filter(string_split(substr($textCol, f * $FrameBytes + 1, $FrameBytes), ''),
       |                c -> c <> ''),
       |    c -> CAST(ascii(c) AS BIGINT))) AS BIGINT) AS frame_checksum
       |FROM $tbl,
       |  LATERAL (SELECT unnest(range(0,
       |    CAST(ceil(CAST(length($textCol) AS DOUBLE) / $FrameBytes) AS BIGINT),
       |    $step)) AS f)
       |WHERE length($textCol) > 0""".stripMargin
}
