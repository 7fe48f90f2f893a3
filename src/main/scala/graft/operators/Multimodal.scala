package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media is carried as opaque `binary` payloads + typed metadata structs —
  * the lakehouse-standard layout (one row per asset, bytes inline for small
  * assets; at 100 TB store a URI instead and keep the same schema). The
  * Spark-side plumbing — schema, batch iteration via `mapPartitions`,
  * partition sizing — is real; the codec itself is STUBBED with a
  * deterministic fake because no image/audio libraries exist in this
  * container. Swap `decodeStub` for a real codec (e.g. javax.imageio /
  * ffmpeg via pipe) without touching any of the dataflow.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true)
    )), nullable = true)
  ))

  // ---- real container-header parsing (no external libs needed) ----

  /** PNG IHDR width/height (spec: 8-byte signature, IHDR first chunk). */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 24) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (!b.take(8).sameElements(sig)) return None
    def be32(o: Int) = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    Some((be32(16), be32(20)))
  }

  /** JPEG SOFn frame width/height (walk markers to SOF0/SOF2). */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 9 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
        val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
        return Some((w, h))
      }
      i += 2 + len
    }
    None
  }

  /** Parse media metadata from real container headers where recognizable;
    * falls back to nulls for unknown formats. Runs as a distributed map —
    * the schema is the `meta` struct of [[mediaSchema]]. */
  def sniffDims(media: DataFrame): DataFrame = {
    val dimsUdf = udf((payload: Array[Byte]) =>
      pngDims(payload).orElse(jpegDims(payload)).orNull)
    media.withColumn("sniffed_dims", dimsUdf(col("payload")))
  }

  /** STUB decode: full pixel decode would need a codec library (absent in
    * this container). The fake derives deterministic pseudo-pixels from the
    * payload hash so downstream feature code is exercised end-to-end; the
    * header parsing above is real. */
  private[operators] def decodeStub(payload: Array[Byte], n: Int = 64): Array[Double] = {
    var h = 0xcbf29ce484222325L
    if (payload != null) {
      var i = 0
      while (i < payload.length) { h ^= payload(i); h *= 0x100000001b3L; i += 1 }
    }
    Array.tabulate(n) { i =>
      var x = h + 0x9e3779b97f4a7c15L * (i + 1)
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      ((x ^ (x >>> 31)) & 0xffL).toDouble / 255.0
    }
  }

  /** Build a demo media table from any source df (payload = text bytes). */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("media_type"),
      col(textCol).cast("binary").as("payload"))
      .withColumn("meta", struct(
        lit(640).as("width"), lit(480).as("height"),
        lit(16000).as("sample_rate"),
        (length(col("payload")) * 10).cast("long").as("duration_ms"),
        lit("stub").as("codec")))

  /** Feature extraction over media batches. `mapPartitions` so a real codec
    * can amortize per-partition init (model load, ffmpeg handle) — the
    * pattern `mapInPandas` uses in PySpark. Output: fixed-width feature
    * vector + simple stats per asset. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("feature", ArrayType(DoubleType), nullable = false),
      StructField("feat_mean", DoubleType, nullable = false),
      StructField("payload_bytes", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    media.select("asset_id", "media_type", "payload").mapPartitions { rows =>
      // per-partition init for a real codec would go here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feat = decodeStub(payload, dim)
        Row(r.getLong(0), r.getString(1), feat.toSeq,
          feat.sum / feat.length, if (payload == null) 0 else payload.length)
      }
    }(enc)
  }

  /** Nearest-neighbor resample of a (w0 × h0) pixel grid to (w × h). The
    * resampling arithmetic is REAL — only the pixel source is the stub
    * decoder; swap that and this is a production thumbnail pass. */
  def resampleNearest(px: Array[Double], w0: Int, h0: Int,
                      w: Int, h: Int): Array[Double] = {
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      val sy = math.min(h0 - 1, y * h0 / h)
      var x = 0
      while (x < w) {
        out(y * w + x) = px(sy * w0 + math.min(w0 - 1, x * w0 / w))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize pass: decode (stub) at source resolution, nearest-neighbor
    * resample to (w × h), emit the thumbnail vector. Same `mapPartitions`
    * batch shape as [[extractFeatures]] so a real codec amortizes init. */
  def resize(media: DataFrame, w: Int, h: Int,
             srcW: Int = 8, srcH: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("thumb", ArrayType(DoubleType), nullable = false),
      StructField("thumb_w", IntegerType, nullable = false),
      StructField("thumb_h", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    media.select("asset_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val px = decodeStub(r.getAs[Array[Byte]]("payload"), srcW * srcH)
        Row(r.getLong(0), resampleNearest(px, srcW, srcH, w, h).toSeq, w, h)
      }
    }(enc)
  }

  /** Frame sampling stub for video: one pseudo-frame per `everyMs`. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0L),
          greatest((col("meta.duration_ms") / everyMs).cast("long") - 1, lit(0L)))))
      .select(col("asset_id"), col("frame_idx"),
        xxhash64(col("payload"), col("frame_idx")).as("frame_fingerprint"))
}
