package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches — the Spark-side shape a 100 TB media pipeline needs
  * (schema, partitioning, batch iteration) with the codec boundary
  * isolated behind [[Codec]].
  *
  * Image decode/resize are REAL (`javax.imageio`, JRE-native PNG /
  * BMP / GIF / JPEG readers — raster dimensions, channel statistics,
  * bilinear rescale). Audio decode is REAL (`javax.sound.sampled`,
  * JRE-native WAV / AIFF / AU header parsers — sample rate, channels,
  * frame count → exact duration_ms). Video and undecodable payloads
  * fall back to a clearly-marked deterministic stub (the JRE has no
  * video codec — the single remaining honest fallback): pseudo
  * dimensions/duration from the byte length, so the pipeline stays
  * total and the gate corpus — text bytes standing in for media —
  * stays SQL-reproducible. The surrounding plumbing — schema
  * contract, mapPartitions batch shape, feature row — is identical on
  * all paths; swapping the stub branch for a javacv/ffmpeg codec
  * changes only [[Codec]].
  */
object MediaFeatures {

  /** Input contract: one row per media object. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("uri", StringType),
    StructField("content", BinaryType),
    StructField("meta_width", IntegerType),
    StructField("meta_height", IntegerType),
    StructField("meta_sample_rate", IntegerType)))

  case class MediaRow(
      media_id: Long,
      media_type: String,
      uri: String,
      content: Array[Byte],
      meta_width: Option[Int],
      meta_height: Option[Int],
      meta_sample_rate: Option[Int])

  case class MediaFeature(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      sha256: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      histogram: Array[Long],   // 16-bucket byte histogram
      mean_byte: Double)

  /** The codec boundary. Image decode is REAL for the formats whose
    * readers ship in the JRE (`javax.imageio`: PNG, BMP, GIF, JPEG,
    * WBMP) — width/height/channel statistics come from the actual
    * decoded raster. Payloads no registered reader accepts (and the
    * audio/video types, for which the JRE has no codec) fall back to
    * the deterministic stub so the pipeline stays total and testable
    * offline; a production deployment swaps the stub branch for a
    * javacv/ffmpeg codec without touching the mapPartitions plumbing.
    */
  object Codec {
    // Executor-side one-time init: ImageIO's default useCache=true
    // writes a disk-cache temp file per decoded payload — per-record
    // /tmp I/O inside the mapPartitions hot path. Decode sources are
    // in-memory byte arrays here, so the cache buys nothing.
    javax.imageio.ImageIO.setUseCache(false)

    final case class Decoded(
        width: Int,
        height: Int,
        durationMs: Long,
        channels: Int = 0,
        channelMean: Array[Double] = Array.empty,
        sampleRate: Int = 0)

    /** Real image decode via the JRE's registered ImageIO readers.
      * Magic-byte pre-check keeps the common non-image payload on a
      * zero-allocation path; a payload that matches a magic but fails
      * to parse (text starting with "BM", truncated PNG) falls back —
      * ImageIO is deterministic for fixed bytes, so so is this.
      */
    private def readImage(
        bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      def magic(sig: Int*): Boolean =
        bytes.length >= sig.length &&
          sig.indices.forall(i => (bytes(i) & 0xff) == sig(i))
      val looksDecodable =
        magic(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) || // PNG
        magic(0x42, 0x4d) ||                                     // BMP
        magic(0xff, 0xd8, 0xff) ||                               // JPEG
        magic(0x47, 0x49, 0x46, 0x38)                            // GIF8
      if (!looksDecodable) None
      else try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    }

    private def decodeImage(bytes: Array[Byte]): Option[Decoded] =
      readImage(bytes).map { im =>
        val raster = im.getRaster
        val ch = raster.getNumBands
        val sums = new Array[Double](ch)
        var y = 0
        while (y < im.getHeight) {
          var x = 0
          while (x < im.getWidth) {
            var c = 0
            while (c < ch) { sums(c) += raster.getSample(x, y, c); c += 1 }
            x += 1
          }
          y += 1
        }
        val n = im.getWidth.toDouble * im.getHeight
        Decoded(im.getWidth, im.getHeight, 0L, ch, sums.map(_ / n))
      }

    /** Real audio header decode via the JRE's `javax.sound.sampled`
      * (WAV/AIFF/AIFC/AU/SND parsers ship in the JRE): sample rate,
      * channels, and frame count → exact duration_ms. Magic-byte
      * gated like images — `RIFF`/`FORM`/`.snd` — so the common
      * non-audio payload (the gate corpus's text bytes) never touches
      * the parser; a payload that matches a magic but fails to parse
      * (or has unknown frame length) falls back to the stub.
      */
    private def decodeAudio(bytes: Array[Byte]): Option[Decoded] = {
      def magic(sig: Int*): Boolean =
        bytes.length >= sig.length &&
          sig.indices.forall(i => (bytes(i) & 0xff) == sig(i))
      val looksDecodable =
        magic('R', 'I', 'F', 'F') ||  // WAV
        magic('F', 'O', 'R', 'M') ||  // AIFF / AIFC
        magic('.', 's', 'n', 'd')     // AU / SND
      if (!looksDecodable) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          if (frames < 0 || fmt.getSampleRate <= 0) None
          else Some(Decoded(0, 0,
            durationMs = (frames * 1000.0 / fmt.getSampleRate).toLong,
            channels = fmt.getChannels,
            sampleRate = math.round(fmt.getSampleRate)))
        } finally in.close()
      } catch { case _: Exception => None }
    }

    /** Deterministic fallback for payloads the JRE cannot decode —
      * pseudo dimensions/duration from the byte length. Video always
      * lands here (no JRE codec — the single remaining honest stub);
      * images/audio only when undecodable.
      */
    private def stubDecode(mediaType: String, bytes: Array[Byte]): Decoded = {
      val n = bytes.length
      mediaType match {
        case "image" => Decoded(width = 1 + (n % 1024), height = 1 + (n / 1024 % 1024), 0L)
        case "audio" => Decoded(0, 0, durationMs = n.toLong / 16)
        case "video" => Decoded(width = 640, height = 360, durationMs = n.toLong / 128)
        case _ => Decoded(0, 0, 0L)
      }
    }

    def decode(mediaType: String, bytes: Array[Byte]): Decoded =
      mediaType match {
        case "image" =>
          decodeImage(bytes).getOrElse(stubDecode(mediaType, bytes))
        case "audio" =>
          decodeAudio(bytes).getOrElse(stubDecode(mediaType, bytes))
        case _ => stubDecode(mediaType, bytes)
      }

    /** Resize: REAL for decodable images — bilinear rescale of the
      * decoded raster, re-encoded as PNG (lossless, JRE-native).
      * Undecodable payloads keep the deterministic stub truncation so
      * the gate corpus (text bytes standing in for media) is
      * SQL-reproducible.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      readImage(bytes) match {
        case Some(im) =>
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(im, 0, 0, w, h, null)
          } finally g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          val wrote = javax.imageio.ImageIO.write(out, "png", buf)
          require(wrote, "no ImageIO PNG writer registered")
          buf.toByteArray
        case None =>
          bytes.take(math.max(16, math.min(bytes.length, w * h / 64)))
      }

    /** STUB — frame sampling: every `stride`-th 1KiB block stands in
      * for a decoded frame.
      */
    def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
      bytes.grouped(1024).zipWithIndex.collect {
        case (b, i) if i % stride == 0 => b
      }.toSeq
  }

  /** One sampled frame: `frame_idx` counts kept frames (0,1,2… —
    * original block index is `frame_idx * stride`).
    */
  case class FrameFeature(
      media_id: Long,
      frame_idx: Int,
      frame_len: Int,
      frame_sha256: String)

  /** Frame sampling as a distributed flatMap: every media row fans out
    * into its strided frames (the codec stub treats each 1 KiB block
    * as a frame), with one digest instance per partition. The
    * per-frame row is where a real pipeline would attach a vision
    * model's embedding — the fan-out shape, batching and schema are
    * the load-bearing parts at scale.
    */
  def sampleFrameFeatures(media: DataFrame, stride: Int): Dataset[FrameFeature] = {
    implicit val enc = Encoders.product[FrameFeature]
    implicit val rowEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { rows =>
      val digest = MessageDigest.getInstance("SHA-256")
      rows.flatMap { r =>
        val bytes = if (r.content == null) Array.emptyByteArray else r.content
        Codec.sampleFrames(bytes, stride).zipWithIndex.map { case (f, i) =>
          digest.reset()
          val sha = digest.digest(f).map("%02x".format(_)).mkString
          FrameFeature(r.media_id, i, f.length, sha)
        }
      }
    }
  }

  /** One resized media row: original + post-resize byte lengths, the
    * metadata re-derived by decoding the resized payload, and its
    * digest (the write-side identity of the resized object).
    */
  case class ResizedMedia(
      media_id: Long,
      media_type: String,
      orig_len: Long,
      new_len: Long,
      new_width: Int,
      new_height: Int,
      resized_sha256: String)

  /** Distributed resize: every payload through the codec stub at a
    * target (w, h), metadata refreshed from the resized bytes — the
    * thumbnail/downsample pass of an image pipeline. Per-partition
    * codec/digest instances, rows stream through; at scale the output
    * column replaces `content` in a new table generation rather than
    * mutating in place.
    */
  def resizeAll(media: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    implicit val rowEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { rows =>
      val digest = MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val bytes = if (r.content == null) Array.emptyByteArray else r.content
        val resized = Codec.resize(bytes, w, h)
        val dec = Codec.decode(r.media_type, resized)
        digest.reset()
        val sha = digest.digest(resized).map("%02x".format(_)).mkString
        ResizedMedia(r.media_id, r.media_type, bytes.length.toLong,
          resized.length.toLong, dec.width, dec.height, sha)
      }
    }
  }

  /** Per-partition batch feature extraction. One codec/digest instance
    * per partition (not per row) — the batch shape that amortizes
    * model/codec init at scale; rows stream through without
    * materializing the partition.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    implicit val rowEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { rows =>
      val digest = MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val bytes = if (r.content == null) Array.emptyByteArray else r.content
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          hist(b >> 4) += 1
          sum += b
          i += 1
        }
        val dec = Codec.decode(r.media_type, bytes)
        MediaFeature(
          r.media_id, r.media_type, bytes.length.toLong, sha,
          if (r.meta_width.exists(_ > 0)) r.meta_width.get else dec.width,
          if (r.meta_height.exists(_ > 0)) r.meta_height.get else dec.height,
          dec.durationMs, hist,
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
      }
    }
  }
}
