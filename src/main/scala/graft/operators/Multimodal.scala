package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.5): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct, and
  * decode / feature-extract / frame-sample run as per-partition
  * transforms — the Scala analogue of `mapInPandas` (a partition
  * iterator, explicit output schema, nothing on the driver).
  *
  * The decode step is pluggable ([[Decoder]]): [[imageDecode]] is a REAL
  * codec on the JDK's `javax.imageio` (PNG/BMP/GIF/JPEG — no external
  * native libs needed), [[decodeStub]] is the deterministic fake used by
  * the oracle-checked gate query (the synthetic corpus carries text
  * payloads, not images). The binary schema, the partition-iterator
  * shape, the explicit result encoder, and the flat (exploded) frame
  * output are the same pipeline either way, oracle-tested byte-for-byte.
  */
object Multimodal {

  /** Bytes per synthetic "frame" for the frame-sample stub. */
  val FrameBytes = 64

  /** A decoder turns an opaque payload into (width, height, checksum). */
  type Decoder = Array[Byte] => (Int, Int, Long)

  /** Attach a binary payload + typed metadata struct to a text table,
    * standing in for a real media column (deterministic: payload =
    * UTF-8 bytes of the text).
    */
  def attachBinary(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit("fake/binary").as("format"),
        octet_length(col("payload")).cast("long").as("n_bytes")))

  /** STUB decode: derives deterministic fake dimensions and a byte
    * checksum from the raw bytes, so the surrounding plumbing is
    * oracle-testable without media codecs. Swap in [[imageDecode]] (or
    * any [[Decoder]]) for real payloads.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    val n = bytes.length
    var checksum = 0L
    var i = 0
    while (i < n) { checksum += bytes(i) & 0xFF; i += 1 }
    (n % 320 + 1, n % 240 + 1, checksum)
  }

  /** REAL image decode via the JDK's built-in codecs (`javax.imageio`:
    * PNG, BMP, GIF, JPEG — no external native libs): actual pixel
    * dimensions plus a deterministic checksum over the 24-bit RGB
    * raster. Runs executor-side inside [[decodeBatch]]'s mapPartitions —
    * codec work cannot be a Catalyst expression, this is the justified
    * per-partition imperative path.
    */
  def imageDecode(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "imageDecode: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    var checksum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { checksum += img.getRGB(x, y) & 0xFFFFFF; x += 1 }
      y += 1
    }
    (w, h, checksum)
  }

  /** Per-partition decode of (`idCol`, payload) → flat metadata row
    * (id, width, height, checksum) with a pluggable [[Decoder]]. Runs as
    * `mapPartitions` with an explicit row encoder: no shuffle, no driver
    * round-trip — the Scala analogue of a `mapInPandas` decode stage.
    */
  def decodeBatch(df: DataFrame, idCol: String,
                  decoder: Decoder = decodeStub): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val src = df.select(col(idCol).cast("long"), col("payload"))
    src.mapPartitions { it =>
      it.map { r =>
        val (w, h, cs) = decoder(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), w, h, cs)
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

  /** A resizer turns (payload, targetW, targetH) into the resized
    * raster's (width, height, checksum).
    */
  type Resizer = (Array[Byte], Int, Int) => (Int, Int, Long)

  /** STUB resize: nearest-neighbor sampling of the BYTE stream as a
    * 1-D "raster" — sample i of m = targetW·targetH reads byte
    * ⌊i·n/m⌋ and the checksum sums the samples. Deterministic, codec-
    * free, and exactly mirrorable in the oracle; swap in
    * [[imageResize]] for real payloads.
    */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): (Int, Int, Long) = {
    val n = bytes.length
    val m = targetW * targetH
    var checksum = 0L
    if (n > 0) {
      var i = 0
      while (i < m) {
        checksum += bytes((i.toLong * n / m).toInt) & 0xFF
        i += 1
      }
    }
    (targetW, targetH, checksum)
  }

  /** REAL image resize via the JDK (decode with `javax.imageio`,
    * nearest-neighbor scale through `java.awt` Graphics2D): returns
    * the resized raster's dimensions and 24-bit-RGB checksum. The same
    * justified per-partition imperative path as [[imageDecode]].
    */
  def imageResize(bytes: Array[Byte], targetW: Int, targetH: Int): (Int, Int, Long) = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(src != null, "imageResize: payload is not a decodable image")
    val out = new java.awt.image.BufferedImage(targetW, targetH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(src, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    var checksum = 0L
    var y = 0
    while (y < targetH) {
      var x = 0
      while (x < targetW) { checksum += out.getRGB(x, y) & 0xFFFFFF; x += 1 }
      y += 1
    }
    (targetW, targetH, checksum)
  }

  /** Per-partition resize of (`idCol`, payload) → (id, width, height,
    * checksum) with a pluggable [[Resizer]] — the batch resize stage of
    * a media-preprocessing pipeline, same no-shuffle `mapPartitions`
    * shape as [[decodeBatch]].
    */
  def resizeBatch(df: DataFrame, idCol: String, targetW: Int, targetH: Int,
                  resizer: Resizer = resizeStub): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val src = df.select(col(idCol).cast("long"), col("payload"))
    src.mapPartitions { it =>
      it.map { r =>
        val (w, h, cs) = resizer(r.getAs[Array[Byte]]("payload"), targetW, targetH)
        Row(r.getLong(0), w, h, cs)
      }
    }(Encoders.row(schema))
  }

  /** DuckDB oracle for [[resizeBatch]] with the stub resizer over
    * ASCII text payloads.
    */
  def duckResizeBatch(tbl: String, textCol: String, idCol: String,
                      targetW: Int, targetH: Int): String = {
    val m = targetW * targetH
    s"""SELECT CAST($idCol AS BIGINT) AS $idCol,
       |  CAST($targetW AS INT) AS width,
       |  CAST($targetH AS INT) AS height,
       |  CAST(CASE WHEN length($textCol) = 0 THEN 0 ELSE
       |    (SELECT sum(ascii($textCol[CAST(i * length($textCol) // $m AS BIGINT) + 1
       |                              : CAST(i * length($textCol) // $m AS BIGINT) + 1]))
       |     FROM range(0, $m) t(i)) END AS BIGINT) AS checksum
       |FROM $tbl""".stripMargin
  }

  /** AUDIO-style feature extraction over an opaque payload treated as
    * unsigned 8-bit PCM samples (the audio analogue of [[decodeBatch]]
    * — real audio codecs aren't in this container, so the byte-domain
    * features ARE the deterministic fake, with the Spark-side
    * plumbing real): per payload, sample count, peak amplitude, and
    * the 128-centered integer energy Σ(b−128)². Integer-exact, so the
    * oracle mirrors bitwise; all narrow codegen'd array work, no
    * mapPartitions needed (no codec in the loop, unlike image decode).
    *
    * Output: (idCol, n_samples, peak, energy).
    */
  def audioFeatures(df: DataFrame, idCol: String): DataFrame = {
    // payload bytes → unsigned ints via the ASCII codes of the utf-8
    // text render (fixture payloads are ASCII text; a real PCM byte
    // column binds the same way)
    val samples = filter(split(decode(col("payload"), "UTF-8"), ""), c => c =!= "")
    val vals = transform(samples, c => ascii(c).cast("long"))
    df.select(col(idCol),
        size(vals).cast("long").as("n_samples"),
        coalesce(array_max(vals), lit(0L)).as("peak"),
        coalesce(aggregate(vals, lit(0L),
          (acc, v) => acc + (v - 128L) * (v - 128L)), lit(0L)).as("energy"))
  }

  /** DuckDB twin of [[audioFeatures]] over ASCII text payloads. */
  def duckAudioFeatures(tbl: String, textCol: String, idCol: String): String =
    s"""SELECT $idCol,
       |  CAST(length($textCol) AS BIGINT) AS n_samples,
       |  CAST(coalesce(list_max(list_transform(
       |    list_filter(string_split($textCol, ''), c -> c <> ''),
       |    c -> CAST(ascii(c) AS BIGINT))), 0) AS BIGINT) AS peak,
       |  CAST(coalesce(list_sum(list_transform(
       |    list_filter(string_split($textCol, ''), c -> c <> ''),
       |    c -> (CAST(ascii(c) AS BIGINT) - 128) * (CAST(ascii(c) AS BIGINT) - 128))), 0) AS BIGINT) AS energy
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
      it.flatMap { r =>
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
    }(Encoders.row(schema))
  }

  /** Bits in the perceptual hash (aHash): sampled byte positions. */
  val PhashBits = 32

  /** Perceptual hash (average-hash) over the payload bytes: sample
    * [[PhashBits]] positions (cycling for short payloads), set bit i
    * when byte_i is above the sample mean. For a decoded image raster
    * this is the classic aHash ("pixel brighter than the mean"); here
    * it runs on the same opaque-payload plumbing as [[decodeBatch]] —
    * swap the byte source for a thumbnail raster in a real codec
    * pipeline. Near-identical payloads land on hamming-near hashes, so
    * downstream near-dup machinery ([[Dedup.simhashPairs]]'s pigeonhole
    * bucketing) applies to media exactly as it does to text.
    *
    * The mean compare stays integral (`byte·bits > Σbytes` instead of
    * `byte > Σ/bits`), so both engines compute identical bits.
    * Output: (idCol, phash); empty payload → 0.
    */
  def perceptualHash(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = true),
      StructField("phash", LongType, nullable = false)))
    val src = df.select(col(idCol).cast("long"), col("payload"))
    src.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        // Null payload = no media: same verdict as an empty payload (0).
        val n = if (bytes == null) 0 else bytes.length
        val ph =
          if (n == 0) 0L
          else {
            var s = 0L
            var j = 0
            while (j < PhashBits) { s += bytes(j % n) & 0xFF; j += 1 }
            var acc = 0L
            var i = 0
            while (i < PhashBits) {
              if ((bytes(i % n) & 0xFF).toLong * PhashBits > s) acc |= 1L << i
              i += 1
            }
            acc
          }
        val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        Row(id, ph)
      }
    }(Encoders.row(schema))
  }

  /** Media near-dup pairs: [[perceptualHash]] fingerprints joined at
    * hamming ≤ `maxHamming` through [[Dedup.hammingPairs]]'s pigeonhole
    * banding — the same banded-equi-join scale posture as text SimHash
    * dedup, applied to opaque binary payloads. 32-bit signatures keep
    * the exact-chunk regime honest up to radius 3 (4 chunks × 8 bits).
    *
    * Output: (idCol pair as id_a < id_b, hamming).
    */
  def phashNearDup(df: DataFrame, idCol: String, maxHamming: Int): DataFrame =
    Dedup.hammingPairs(perceptualHash(df, idCol), idCol, "phash",
      PhashBits, maxHamming)

  /** DuckDB oracle twin of [[phashNearDup]]: the EXACT all-pairs
    * hamming join over [[duckPerceptualHash]] fingerprints — candidate
    * recall of the banded engine is exact by pigeonhole, so the two
    * agree row-for-row (caller keeps the corpus slice small enough for
    * the O(n²) oracle).
    */
  def duckPhashNearDup(tbl: String, textCol: String, idCol: String,
                       maxHamming: Int): String =
    s"""WITH ph AS (${duckPerceptualHash(tbl, textCol, idCol)})
       |SELECT a.$idCol AS id_a, b.$idCol AS id_b,
       |       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
       |FROM ph a JOIN ph b ON a.$idCol < b.$idCol
       |WHERE bit_count(xor(a.phash, b.phash)) <= $maxHamming""".stripMargin

  /** DuckDB oracle for [[perceptualHash]] over ASCII text (byte value =
    * char code, mirroring [[attachBinary]]'s UTF-8 payload).
    */
  def duckPerceptualHash(tbl: String, textCol: String, idCol: String): String =
    s"""WITH b AS (SELECT CAST($idCol AS BIGINT) AS $idCol, $textCol AS t,
       |                  length($textCol) AS n FROM $tbl),
       |s AS (SELECT $idCol,
       |             CAST(sum(ascii(substr(t, CAST(j % n AS INT) + 1, 1))) AS BIGINT) AS s32
       |      FROM b, range(0, $PhashBits) r(j) WHERE n > 0 GROUP BY $idCol),
       |ph AS (SELECT b.$idCol,
       |              CAST(sum(CASE WHEN CAST(ascii(substr(t, CAST(i % n AS INT) + 1, 1)) AS BIGINT)
       |                                 * $PhashBits > s32
       |                            THEN CAST(1 AS BIGINT) << CAST(i AS INT) ELSE 0 END) AS BIGINT) AS phash
       |       FROM b JOIN s USING ($idCol), range(0, $PhashBits) r(i)
       |       GROUP BY b.$idCol)
       |SELECT $idCol, phash FROM ph
       |UNION ALL
       |SELECT $idCol, CAST(0 AS BIGINT) AS phash FROM b WHERE n = 0 OR n IS NULL""".stripMargin

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
