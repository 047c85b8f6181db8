package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * IMAGES are decoded for real via `javax.imageio` (JDK built-in — no
  * external codec needed): [[ImageCodec]] encodes deterministic PNG
  * fixtures and [[imageStats]] decodes them back to pixel statistics.
  * AUDIO is decoded for real by a hand-rolled RIFF/WAVE PCM16 codec
  * ([[AudioCodec]] — javax.sound's per-call provider-registry scan
  * serialized concurrent executors; see encodePcm): it encodes
  * deterministic 16-bit PCM WAV fixtures and [[audioStats]] decodes
  * them back to sample statistics.
  * VIDEO is decoded for real for AVI containers whose frames ImageIO
  * can read — MJPG (motion-JPEG) and MPNG (motion-PNG): [[VideoCodec]]
  * is a pure-JDK RIFF/AVI writer + parser (the container is plain
  * chunked RIFF; each '00dc' frame chunk is a complete JPEG/PNG that
  * `javax.imageio` decodes), so frame extraction + per-frame pixel
  * statistics (q118) are real decode, not byte stats. Codecs the JDK
  * cannot decode (H.264 etc.) remain out of scope — the container
  * still parses, the frame decode yields no rows. `FakeDecoder`
  * survives only as the byte-statistics contract behind q38/q47, whose
  * oracles check container-blob byte stats by design.
  *
  * Scale notes: media blobs are large, so the operators (a) never widen
  * the row (features replace the blob via select, keeping the shuffle
  * narrow), (b) process per-partition with an iterator (no
  * whole-partition materialization), and (c) repartition by a size-aware
  * key upstream when blob-size skew matters (`repartitionBySize`).
  */
object Multimodal {

  /** Typed media row: blob + metadata, the canonical multimodal schema. */
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
                      width: Int, height: Int)

  /** Extracted feature row: the blob is GONE after extraction — only the
    * fixed-width feature survives downstream.
    */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           byte_mean: Double, histogram: Array[Long])

  /** Deterministic standin for a real media decoder. */
  object FakeDecoder {
    /** "Decode" = byte statistics + a 16-bin byte histogram. A real
      * implementation would decode pixels/samples here.
      */
    def decode(r: MediaRow): MediaFeatures = {
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < r.content.length) {
        val b = r.content(i) & 0xff
        hist(b >> 4) += 1
        sum += b
        i += 1
      }
      val mean = if (r.content.length == 0) 0.0 else sum.toDouble / r.content.length
      MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
        math.round(mean * 10000).toDouble / 10000, hist)
    }
  }

  /** REAL image codec over `javax.imageio`. Fixture images are
    * deterministic RGB patterns — pixel (x, y) of image `id` has
    * channels ((x·7 + y·11 + id·3) mod 256, (x·13 + y·5 + id·7) mod 256,
    * (x·3 + y·17 + id·11) mod 256) — so, PNG being lossless, the decoded
    * pixel sums are computable ANALYTICALLY with integer arithmetic: the
    * DuckDB oracle derives the expected stats from the formula without
    * ever seeing a PNG, and a hash match proves the whole
    * encode→decode→aggregate roundtrip bit-exact.
    */
  object ImageCodec {
    def channels(id: Long, x: Int, y: Int): (Int, Int, Int) = (
      ((x * 7L + y * 11L + id * 3L) % 256L).toInt,
      ((x * 13L + y * 5L + id * 7L) % 256L).toInt,
      ((x * 3L + y * 17L + id * 11L) % 256L).toInt)

    /** Deterministic PNG fixture for media id (lossless TYPE_INT_RGB). */
    def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = channels(id, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode PNG/JPEG bytes to per-channel pixel sums (the real decode —
      * null-safe: undecodable bytes yield null, never a fake zero row).
      */
    def decodeSums(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        Some((img.getWidth, img.getHeight, sr, sg, sb))
      }
    }
  }

  /** Hand-rolled minimal PNG codec for the video-fingerprint hot path —
    * the javax.imageio reader costs ~40-60 µs of setup PER CALL, which
    * at millions of tiny frames (25K videos × ~100 frames at sf0.1)
    * dominates the q134 stage; Inflater on a 100-byte stream is a few
    * µs. Scope is deliberately narrow: 8-bit non-interlaced grayscale
    * (colortype 0) and truecolor (colortype 2) per the public PNG spec
    * (RFC 2083) — exactly what [[javax.imageio]] emits for
    * TYPE_BYTE_GRAY/TYPE_INT_RGB — with all five scanline filters.
    * Anything else returns None and the caller falls back to ImageIO,
    * so MJPG frames and exotic PNGs still decode correctly.
    */
  object PngCodec {
    private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

    /** Encode a uniform-gray image as 8-bit TRUECOLOR PNG with r=g=b=v
      * (filter 0 rows; one deflate stream). Truecolor, not colortype 0:
      * ImageIO routes grayscale PNGs through a gray→sRGB ColorConvertOp
      * (gray 220 reads back as 239 via getRGB), while truecolor samples
      * pass through untouched — so this encoding decodes to exactly
      * (v,v,v) under BOTH ImageIO and [[decodeGraySum]].
      */
    def encodeGray(w: Int, h: Int, v: Int): Array[Byte] = {
      val stride = 3 * w
      val raw = new Array[Byte](h * (1 + stride))
      var y = 0
      while (y < h) {
        val base = y * (1 + stride)
        raw(base) = 0 // filter: None
        java.util.Arrays.fill(raw, base + 1, base + 1 + stride, v.toByte)
        y += 1
      }
      val def_ = new java.util.zip.Deflater()
      def_.setInput(raw); def_.finish()
      val comp = new Array[Byte](raw.length + 64)
      val n = def_.deflate(comp)
      def_.end()
      val ihdr = new Array[Byte](13)
      wrBe32(ihdr, 0, w); wrBe32(ihdr, 4, h)
      ihdr(8) = 8 // bit depth
      ihdr(9) = 2 // colortype: truecolor (see scaladoc)
      // compression 0, filter 0, interlace 0 already zeroed
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Sig, 0, Sig.length)
      writeChunk(bos, "IHDR", ihdr, 13)
      writeChunk(bos, "IDAT", comp, n)
      writeChunk(bos, "IEND", Array.emptyByteArray, 0)
      bos.toByteArray
    }

    private def wrBe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
      b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
    }

    private def writeChunk(bos: java.io.ByteArrayOutputStream, typ: String,
                           body: Array[Byte], n: Int): Unit = {
      val len = new Array[Byte](4); wrBe32(len, 0, n)
      bos.write(len, 0, 4)
      val t = typ.getBytes("US-ASCII")
      bos.write(t, 0, 4)
      bos.write(body, 0, n)
      val crc = new java.util.zip.CRC32()
      crc.update(t, 0, 4); crc.update(body, 0, n)
      val c = new Array[Byte](4); wrBe32(c, 0, crc.getValue.toInt)
      bos.write(c, 0, 4)
    }

    private def rdBe32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

    /** Decode to (width, height, sum of per-pixel gray) where gray =
      * (r+g+b)/3 for truecolor and the sample itself for grayscale —
      * the same per-pixel value [[videoFingerprint]]/[[imageAHash]]
      * derive from getRGB. None when the bytes are not a PNG this
      * narrow decoder covers (caller falls back to ImageIO).
      */
    def decodeGraySum(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
      if (bytes.length < 33) return None
      var i = 0
      while (i < 8) { if (bytes(i) != Sig(i)) return None; i += 1 }
      if (rdBe32(bytes, 8) != 13 ||
          new String(bytes, 12, 4, "US-ASCII") != "IHDR") return None
      val w = rdBe32(bytes, 16); val h = rdBe32(bytes, 20)
      val depth = bytes(24); val ctype = bytes(25)
      val interlace = bytes(28)
      if (w <= 0 || h <= 0 || depth != 8 || interlace != 0 ||
          (ctype != 0 && ctype != 2)) return None
      val bpp = if (ctype == 0) 1 else 3
      // concatenate IDAT payloads
      val idat = new java.io.ByteArrayOutputStream()
      var p = 33
      var ok = true
      while (ok && p + 8 <= bytes.length) {
        val sz = rdBe32(bytes, p)
        val typ = new String(bytes, p + 4, 4, "US-ASCII")
        if (sz < 0 || p + 8 + sz > bytes.length) ok = false
        else {
          if (typ == "IDAT") idat.write(bytes, p + 8, sz)
          if (typ == "IEND") ok = false
          p += 12 + sz
        }
      }
      val comp = idat.toByteArray
      if (comp.isEmpty) return None
      val stride = w * bpp
      val raw = new Array[Byte](h * (1 + stride))
      val inf = new java.util.zip.Inflater()
      inf.setInput(comp)
      try {
        var off = 0
        while (off < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, off, raw.length - off)
          if (n == 0 && inf.needsInput()) return None // truncated
          off += n
        }
        if (off != raw.length) return None
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inf.end()
      // unfilter in place (per the PNG spec's five row filters), summing
      // gray as rows complete; prior row kept unfiltered for Up/Avg/Paeth
      val prev = new Array[Int](stride)
      val cur = new Array[Int](stride)
      var sum = 0L
      var y = 0
      while (y < h) {
        val base = y * (1 + stride)
        val ft = raw(base) & 0xff
        var x = 0
        while (x < stride) {
          val rv = raw(base + 1 + x) & 0xff
          val a = if (x >= bpp) cur(x - bpp) else 0
          val b = prev(x)
          val c = if (x >= bpp) prev(x - bpp) else 0
          val v = ft match {
            case 0 => rv
            case 1 => rv + a
            case 2 => rv + b
            case 3 => rv + ((a + b) >> 1)
            case 4 =>
              val pp = a + b - c
              val pa = math.abs(pp - a); val pb = math.abs(pp - b)
              val pc = math.abs(pp - c)
              rv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => return None
          }
          cur(x) = v & 0xff
          x += 1
        }
        if (bpp == 1) { x = 0; while (x < w) { sum += cur(x); x += 1 } }
        else {
          x = 0
          while (x < w) {
            sum += (cur(3 * x) + cur(3 * x + 1) + cur(3 * x + 2)) / 3
            x += 1
          }
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        y += 1
      }
      Some((w, h, sum))
    }
  }

  /** REAL audio codec — hand-rolled RIFF/WAVE (16-bit signed
    * little-endian PCM, mono), no javax.sound in the hot path. Fixture clips are deterministic integer
    * patterns — sample i of clip `id` is ((i·7 + id·13) mod 4096) − 2048
    * over n = (id mod 400) + 100 samples — so, PCM WAV being lossless,
    * the decoded sample sums are computable ANALYTICALLY: the DuckDB
    * oracle derives expected stats from the formula without ever seeing
    * a WAV file, and a hash match proves the whole
    * encode→decode→aggregate roundtrip bit-exact (same oracle trick as
    * [[ImageCodec]]).
    */
  object AudioCodec {
    val SampleRate = 8000f

    def nSamples(id: Long): Int = (id % 400).toInt + 100

    def sampleAt(id: Long, i: Int): Int =
      (((i * 7L + id * 13L) % 4096L) - 2048L).toInt

    /** 16-bit signed little-endian mono WAV from raw sample values —
      * the canonical 44-byte RIFF/WAVE header written directly,
      * byte-identical to javax.sound's WAVE writer for this format.
      * Hand-rolled (like the AVI container, [[VideoCodec]]) because
      * javax.sound.sampled.AudioSystem does a provider-registry scan
      * per call whose synchronization SERIALIZES concurrent executors:
      * measured at the sf10 tier, 32-way audio encode+decode ran 2×
      * slower than single-threaded (q81 104 s / 20.4×-per-decade,
      * q132 58 s / 18.5× — both dropped to linear with this codec).
      */
    def encodePcm(samples: Array[Int]): Array[Byte] = {
      val n = samples.length
      val dataLen = n * 2
      val out = new Array[Byte](44 + dataLen)
      def le32(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >> 8) & 0xff).toByte
        out(off + 2) = ((v >> 16) & 0xff).toByte
        out(off + 3) = ((v >> 24) & 0xff).toByte
      }
      def le16(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte
        out(off + 1) = ((v >> 8) & 0xff).toByte
      }
      def tag(off: Int, s: String): Unit = {
        var i = 0
        while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
      }
      val rate = SampleRate.toInt
      tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
      tag(12, "fmt "); le32(16, 16)
      le16(20, 1) // PCM
      le16(22, 1) // mono
      le32(24, rate)
      le32(28, rate * 2) // byte rate (16-bit mono)
      le16(32, 2) // block align
      le16(34, 16) // bits per sample
      tag(36, "data"); le32(40, dataLen)
      var i = 0
      while (i < n) {
        val s = samples(i)
        out(44 + 2 * i) = (s & 0xff).toByte // little-endian
        out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      out
    }

    /** Minimal RIFF/WAVE chunk walk for 16-bit PCM: returns the
      * [start, end) byte range of the data chunk, or None for
      * anything malformed / non-PCM16 (corrupt blobs must drop, never
      * throw — the same contract the javax path had). Samples are
      * little-endian (every WAV this engine reads or writes; RIFX
      * big-endian is out of the supported subset and returns None via
      * the magic check).
      */
    def pcm16DataRange(bytes: Array[Byte]): Option[(Int, Int)] = {
      def le32(off: Int): Int =
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
          ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
      def le16(off: Int): Int =
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      def tag(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      try {
        if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
        var off = 12
        var sampleBits = -1
        var pcmFormat = -1
        var data: Option[(Int, Int)] = None
        while (off + 8 <= bytes.length) {
          val id = tag(off)
          val len = le32(off + 4)
          if (len < 0 || off + 8 + len > bytes.length) return None
          if (id == "fmt " && len >= 16) {
            pcmFormat = le16(off + 8)
            sampleBits = le16(off + 22)
          } else if (id == "data") {
            data = Some((off + 8, off + 8 + len))
          }
          off += 8 + len + (len & 1) // chunks pad to even length
        }
        if (pcmFormat == 1 && sampleBits == 16) data else None
      } catch { case _: Exception => None }
    }

    /** Deterministic WAV fixture for media id (lossless 16-bit PCM). */
    def encodeWav(id: Long): Array[Byte] =
      encodePcm(Array.tabulate(nSamples(id))(i => sampleAt(id, i)))

    // --- near-dup audio fixture family (the audio twin of
    //     mediaWithDupImages' same-picture-different-size groups):
    //     gid = id/10 groups share one 64-window amplitude pattern at
    //     DIFFERENT durations (n is a multiple of 64, so windows stay
    //     exactly aligned and the energy fingerprint is duration-
    //     invariant), and each member flips ONE window — same-group
    //     pairs sit at Hamming exactly 2, byte-exact dedup pairs
    //     nothing (every clip's WAV bytes differ). All-integer formula
    //     => the DuckDB oracle derives the fingerprint without ever
    //     decoding a WAV.

    def dupNSamples(id: Long): Int = 64 * ((id % 5).toInt + 2)

    def dupFlipWindow(id: Long): Int = (((id % 10) * 11) % 64).toInt

    /** Window amplitude: base bit k = bit (k mod 60) of the 60-bit md5
      * hash of gid, one window XOR-flipped per group member; 240 vs 10
      * keeps every mean strictly between the two levels, so the
      * threshold bit IS the formula bit.
      *
      * md5 bits, NOT a linear formula: bits 3-5 of (gid*A + k*B) — the
      * first attempt — depend only on the addends mod 64 (carries into
      * bit 3 come from bits 0-2 alone), so gids equal mod 64 produced
      * IDENTICAL base patterns and 7.3M spurious cross-group Hamming-2
      * pairs at sf1. The hash pattern is unique per gid at any corpus
      * size, so pair output scales with the group count.
      */
    def dupAmp(id: Long, k: Int): Int = {
      val h = graft.functions.TextFunctions.tokenHash64Jvm((id / 10).toString)
      val bit = (((h >> (k % 60)) & 1L) == 1L) ^ (k == dupFlipWindow(id))
      if (bit) 240 else 10
    }

    /** Decode WAV bytes to (n_samples, sum, sum_sq, sum_abs) — the real
      * decode via AudioSystem; handles either endianness from the header.
      * Undecodable / non-16-bit blobs yield None, never a fake zero row.
      */
    def decodeStats(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] =
      pcm16DataRange(bytes).map { case (lo, hi) =>
        val n = (hi - lo) / 2
        var sum = 0L; var sumSq = 0L; var sumAbs = 0L
        var i = 0
        while (i < n) {
          val s = (bytes(lo + 2 * i + 1).toInt << 8) | (bytes(lo + 2 * i) & 0xff)
          sum += s; sumSq += s.toLong * s; sumAbs += math.abs(s)
          i += 1
        }
        (n.toLong, sum, sumSq, sumAbs)
      }
  }

  /** Media table with REAL audio blobs: every odd doc_id becomes a WAV
    * fixture (the even ids are the PNG fixtures of
    * [[mediaWithRealImages]]; encoded on the executors — the generate
    * step is distributed map work). width carries n_samples, height the
    * sample rate, reusing the canonical media schema.
    */
  def mediaWithRealAudio(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).filter(pmod(col("doc_id"), lit(2)) === 1)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          MediaRow(id, "audio", AudioCodec.encodeWav(id),
            AudioCodec.nSamples(id), AudioCodec.SampleRate.toInt)
        }
      }
  }

  /** Decoded audio statistics: blob gone, fixed-width row out. Integer
    * sums (sum, sum of squares, sum of abs) keep the oracle compare
    * exact — no float accumulation anywhere.
    */
  case class AudioStats(media_id: Long, n_samples: Long, sum_s: Long,
                        sum_sq: Long, sum_abs: Long)

  /** REAL decode: WAV bytes → sample-sum stats via the RIFF chunk
    * walk ([[AudioCodec.pcm16DataRange]]); undecodable blobs are
    * dropped, not faked.
    */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        AudioCodec.decodeStats(r.content).map { case (n, s, sq, sa) =>
          AudioStats(r.media_id, n, s, sq, sa)
        }
      }
    }
  }

  /** Media table with REAL near-dup WAV groups (odd doc_ids; see the
    * AudioCodec.dup* formulas): windows of constant amplitude, group
    * members differ in duration and one flipped window. Encoded on the
    * executors — map-only generate, like every fixture table here.
    */
  def mediaWithDupAudio(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).filter(pmod(col("doc_id"), lit(2)) === 1)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = AudioCodec.dupNSamples(id)
          val win = n / 64
          val amps = Array.tabulate(64)(k => AudioCodec.dupAmp(id, k))
          val samples = Array.tabulate(n)(i => amps(i / win))
          MediaRow(id, "audio", AudioCodec.encodePcm(samples),
            n, AudioCodec.SampleRate.toInt)
        }
      }
  }

  case class AudioHash(media_id: Long, fhash: Long)

  /** 64-bit audio energy fingerprint from REAL decoded PCM: the clip is
    * cut into `nWindows` equal time windows (integer boundaries
    * k·n/nWindows) and bit k is set when window k's mean |sample|
    * exceeds the whole-clip mean — compared cross-multiplied in Long
    * arithmetic (sumAbs_k · n > sumAbs_total · n_k), so the hash is
    * bit-reproducible and the DuckDB oracle can derive it analytically
    * for the fixture formulas. The audio twin of [[imageAHash]]: feeds
    * the same [[graft.operators.Dedup.hammingNearDup]] banding join.
    * None for undecodable blobs or clips shorter than nWindows samples.
    */
  def audioFingerprint(bytes: Array[Byte], nWindows: Int = 64): Option[Long] =
    AudioCodec.pcm16DataRange(bytes).flatMap { case (dLo, dHi) =>
      val n = (dHi - dLo) / 2
      if (n < nWindows) None
      else {
        val winAbs = new Array[Long](nWindows)
        val winN = new Array[Long](nWindows)
        var total = 0L
        var k = 0
        while (k < nWindows) {
          val lo = (k.toLong * n / nWindows).toInt
          val hi = ((k + 1).toLong * n / nWindows).toInt
          var i = lo
          var s = 0L
          while (i < hi) {
            val v = (bytes(dLo + 2 * i + 1).toInt << 8) | (bytes(dLo + 2 * i) & 0xff)
            s += math.abs(v)
            i += 1
          }
          winAbs(k) = s; winN(k) = hi - lo; total += s
          k += 1
        }
        var h = 0L
        k = 0
        while (k < nWindows) {
          if (winAbs(k) * n > total * winN(k)) h |= 1L << k
          k += 1
        }
        Some(h)
      }
    }

  /** Fingerprint every audio blob: blob dies in-stage, an 8-byte hash
    * rides on — the input row to Hamming near-dup banding.
    */
  def audioFingerprints(media: Dataset[MediaRow]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap(r => audioFingerprint(r.content).map(AudioHash(r.media_id, _)))
    }
  }

  case class SilenceSeg(media_id: Long, seg: Long, start_win: Long,
                        end_win: Long, n_win: Long)

  /** Silence segmentation over REAL decoded PCM (the audio counterpart
    * of [[videoSceneCuts]]' keyframe detection — the VAD-lite primitive
    * a speech pipeline runs before transcription): the clip is cut into
    * `nWindows` equal windows (the [[audioFingerprint]] boundaries) and
    * window k is silent when its mean |sample| is below `thrAbs` —
    * compared cross-multiplied (sumAbs_k < thrAbs · n_k), no division.
    * Consecutive silent windows merge into segments (seg index, first
    * and last window, length), computed INSIDE the map step — windows
    * are file-local, so segmentation is map-only: zero shuffle, the
    * blob dies in-stage, undecodable/short clips yield no rows rather
    * than a throw. The fixture's constant-amplitude windows make the
    * oracle analytic: silent ⟺ the md5 formula bit is 0.
    */
  def audioSilenceSegments(media: Dataset[MediaRow], nWindows: Int = 64,
                           thrAbs: Long = 100L): Dataset[SilenceSeg] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        AudioCodec.pcm16DataRange(m.content).toSeq.flatMap { case (dLo, dHi) =>
          val n = (dHi - dLo) / 2
          if (n < nWindows) Seq.empty
          else {
            val segs = Seq.newBuilder[SilenceSeg]
            var seg = 0L
            var runStart = -1
            var k = 0
            while (k < nWindows) {
              val lo = (k.toLong * n / nWindows).toInt
              val hi = ((k + 1).toLong * n / nWindows).toInt
              var s = 0L
              var i = lo
              while (i < hi) {
                val v = (m.content(dLo + 2 * i + 1).toInt << 8) |
                  (m.content(dLo + 2 * i) & 0xff)
                s += math.abs(v)
                i += 1
              }
              val silent = s < thrAbs * (hi - lo)
              if (silent && runStart < 0) runStart = k
              if (!silent && runStart >= 0) {
                segs += SilenceSeg(m.media_id, seg, runStart, k - 1, k - runStart)
                seg += 1; runStart = -1
              }
              k += 1
            }
            if (runStart >= 0)
              segs += SilenceSeg(m.media_id, seg, runStart, nWindows - 1,
                nWindows - runStart)
            segs.result()
          }
        }
      }
    }
  }

  /** REAL image resize: decode via javax.imageio, nearest-neighbor
    * resample (source pixel of (x', y') is (x'·w/w', y'·h/h'), integer
    * floor — the same index mapping the byte-level [[resize]] stub uses,
    * so the oracle can compute resized pixel sums analytically from the
    * fixture pattern), re-encode PNG. None when the blob is not an image.
    */
  def resizeImagePng(bytes: Array[Byte], w2: Int, h2: Int): Option[Array[Byte]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val out = new java.awt.image.BufferedImage(
        w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          out.setRGB(x, y, img.getRGB(
            (x.toLong * img.getWidth / w2).toInt,
            (y.toLong * img.getHeight / h2).toInt))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** Resize every image blob (real decode → resample → re-encode);
    * non-decodable blobs are dropped. Map-only: blob replaced in place,
    * metadata updated, rows never widen.
    */
  def resizeImages(media: Dataset[MediaRow], w2: Int, h2: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        resizeImagePng(r.content, w2, h2)
          .map(b => r.copy(content = b, width = w2, height = h2))
      }
    }
  }

  /** Decoded image statistics: the blob is gone, fixed-width row out. */
  case class ImageStats(media_id: Long, width: Long, height: Long,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  /** Media table with REAL image blobs: every even doc_id becomes a PNG
    * fixture (w, h derived from the id; encoded on the executors, not
    * the driver — the generate step is itself distributed map work).
    */
  def mediaWithRealImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).filter(pmod(col("doc_id"), lit(2)) === 0)
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file I/O per encode
        it.map { id =>
          val w = (id % 16).toInt + 8
          val h = (id % 12).toInt + 8
          MediaRow(id, "image", ImageCodec.encodePng(id, w, h), w, h)
        }
      }
  }

  /** Duplicate-image fixture for perceptual-hash dedup: the pixel
    * pattern is keyed by gid = id div 10 over the 8x8 CELL grid (every
    * pixel of cell (cx, cy) is gray 220 or 30 by bit (cy*8+cx) mod 60
    * of the 60-bit md5 hash of gid — two levels far from any mean, so
    * the threshold bits are size-invariant), while width/height still
    * vary per id — so the ~5 even ids
    * sharing a gid are the SAME picture rendered at different sizes,
    * exactly the rescaled-duplicate mode a perceptual hash exists to
    * catch (and byte-level exact dedup cannot). Cell-constant gray
    * also makes the aHash analytically derivable, so the DuckDB oracle
    * recomputes it from the formula without decoding a PNG — same
    * trick as [[AudioCodec]]'s analytic sample sums.
    *
    * The pattern is an md5 BIT pattern, not a small-modulus formula: an
    * earlier (cx*13 + cy*29 + gid*97) mod 257 pattern had only 257
    * distinct pictures — at sf1's 12.5K images that made ~49-member
    * identical-image mega-groups and a 26x growth row from genuinely
    * quadratic pair output. gid enters via the full-width hash, so
    * every group is a distinct picture at any corpus size and pair
    * output scales linearly with the group count.
    */
  def mediaWithDupImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).filter(pmod(col("doc_id"), lit(2)) === 0)
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val w = (id % 16).toInt + 8
          val h = (id % 12).toInt + 8
          val gid = id / 10
          val hp = graft.functions.TextFunctions.tokenHash64Jvm(gid.toString)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val cx = x * 8 / w
              val v = if (((hp >> ((cy * 8 + cx) % 60)) & 1L) == 1L) 220 else 30
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRow(id, "image", bos.toByteArray, w, h)
        }
      }
  }

  case class ImageHash(media_id: Long, ahash: Long)

  /** Average-hash (aHash) from REAL decoded pixels: the image is
    * area-binned to the 8x8 grid (pixel (x, y) -> cell (x*8 div w,
    * y*8 div h)), and bit k is set iff cell k's mean gray exceeds the
    * image's global mean. Means are compared by integer
    * cross-multiplication (cell_sum * w*h > total_sum * cell_count) —
    * no floating point anywhere, so the hash is bit-identical on every
    * engine and partition count. Map-only; one long per image leaves
    * the stage. Undecodable blobs are dropped, not faked.
    */
  def imageAHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.content))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val cellSum = new Array[Long](64)
          val cellCnt = new Array[Long](64)
          var total = 0L
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val g = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              val k = cy * 8 + x * 8 / w
              cellSum(k) += g; cellCnt(k) += 1; total += g
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          var hash = 0L
          var k = 0
          while (k < 64) {
            if (cellCnt(k) > 0 && cellSum(k) * n > total * cellCnt(k))
              hash |= (1L << k)
            k += 1
          }
          Some(ImageHash(r.media_id, hash))
        }
      }
    }
  }

  /** REAL decode: PNG bytes → pixel-sum stats via javax.imageio.
    * mapPartitions so codec setup (ImageIO cache off — no temp-file I/O
    * on the executors) happens once per partition, not once per row.
    * Undecodable blobs are dropped, not faked.
    */
  def imageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        ImageCodec.decodeSums(r.content).map { case (w, h, sr, sg, sb) =>
          ImageStats(r.media_id, w.toLong, h.toLong, sr, sg, sb)
        }
      }
    }
  }

  /** REAL video codec: a pure-JDK RIFF/AVI container writer + parser.
    * An AVI file is chunked RIFF — `RIFF('AVI ' LIST('hdrl' avih
    * LIST('strl' strh strf)) LIST('movi' 00dc...) idx1)` — and for the
    * MJPG/MPNG codecs every '00dc' frame chunk is a complete JPEG/PNG
    * byte stream, so `javax.imageio` decodes each frame exactly as it
    * decodes a standalone image: container parse and frame decode are
    * both real, no external codec needed. Fixtures use MPNG (lossless),
    * so decoded pixel sums are computable ANALYTICALLY from the
    * [[ImageCodec.channels]] formula at seed `frameSeed(id, f)` — the
    * DuckDB oracle never sees an AVI byte (same trick as ImageCodec /
    * AudioCodec). The MJPG path is exercised in tests structurally
    * (frame count + dimensions; JPEG is lossy so sums are not
    * analytic).
    *
    * Layout refs: MainAVIHeader/AVIStreamHeader/BITMAPINFOHEADER field
    * order per the public OpenDML AVI spec; chunks pad to even offsets;
    * idx1 offsets are relative to the first byte after the 'movi'
    * fourcc (the common convention, starting at 4).
    */
  object VideoCodec {
    def dims(id: Long): (Int, Int) = (((id % 12) + 8).toInt, ((id % 10) + 8).toInt)
    def nFrames(id: Long): Int = ((id % 4) + 2).toInt
    /** Per-frame pattern seed: frame f of video id draws the
      * [[ImageCodec.channels]] pattern at this seed.
      */
    def frameSeed(id: Long, f: Int): Long = id * 1000L + f

    /** Near-dup fixture formulas — the video twin of AudioCodec.dup*.
      * Durations differ within a group (64 or 128 frames) so AVI bytes
      * never byte-match, while the 64-window temporal luminance profile
      * is the group's md5-bit pattern with ONE window flipped per
      * member (distinct flip per member => same-group pairs at Hamming
      * exactly 2). Frames are uniform-gray MPNG, so frame dims and
      * counts cancel out of the threshold bit: bit k reduces to
      * gray_k*64 > sum(gray) — the analytic form the DuckDB oracle
      * recomputes without decoding a container.
      */
    def dupNFrames(id: Long): Int = 64 * ((id % 2).toInt + 1)

    def dupFlipWindow(id: Long): Int = (((id % 10) * 11) % 64).toInt

    /** Window gray level: base bit k = bit (k mod 60) of the 60-bit
      * md5 hash of 'v'+gid ('v' decorrelates from the audio fixture's
      * pattern), one window XOR-flipped per member; 220 vs 30 keeps
      * every mean strictly between the two levels. md5 bits, not a
      * linear formula — see AudioCodec.dupAmp for the measured reason
      * (linear patterns collide mod 64 and explode pair output at sf1).
      */
    def dupGray(id: Long, k: Int): Int = {
      val h = graft.functions.TextFunctions.tokenHash64Jvm("v" + (id / 10))
      val bit = (((h >> (k % 60)) & 1L) == 1L) ^ (k == dupFlipWindow(id))
      if (bit) 220 else 30
    }

    /** Deterministic MPNG-in-AVI fixture for media id. */
    def encodeAvi(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      val frames = (0 until nFrames(id))
        .map(f => ImageCodec.encodePng(frameSeed(id, f), w, h))
      buildAvi(w, h, frames, "MPNG")
    }

    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def cc(s: String): Array[Byte] = {
      require(s.length == 4, s"fourcc must be 4 chars: '$s'")
      s.getBytes("US-ASCII")
    }
    /** `ckid size data [pad]` — chunk data pads to an even boundary. */
    private def chunk(ckid: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(ckid) ++ le32(body.length) ++ body ++ pad
    }
    /** `LIST size type children` — size covers type + children. */
    private def list(listType: String, children: Array[Byte]): Array[Byte] =
      cc("LIST") ++ le32(4 + children.length) ++ cc(listType) ++ children

    /** Assemble a single-video-stream AVI around pre-encoded frames. */
    def buildAvi(w: Int, h: Int, frames: Seq[Array[Byte]],
                 codec: String): Array[Byte] = {
      val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
      // MainAVIHeader (56 bytes): 10 fps, AVIF_HASINDEX
      val avih = chunk("avih",
        le32(100000) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
          le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++
          le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      // AVIStreamHeader (56 bytes): 'vids', dwScale/dwRate = 1/10
      val strh = chunk("strh",
        cc("vids") ++ cc(codec) ++ le32(0) ++ le16(0) ++ le16(0) ++
          le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++ le32(frames.length) ++
          le32(maxFrame) ++ le32(-1) ++ le32(0) ++
          le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
      // BITMAPINFOHEADER (40 bytes) with the codec fourcc as biCompression
      val strf = chunk("strf",
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
          cc(codec) ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val moviChunks = frames.map(f => chunk("00dc", f))
      val movi = list("movi", moviChunks.flatMap(_.toSeq).toArray)
      // idx1: offset of each '00dc' fourcc relative to just after 'movi'
      var off = 4
      val idxEntries = moviChunks.zip(frames).map { case (mc, f) =>
        val e = cc("00dc") ++ le32(0x10) ++ le32(off) ++ le32(f.length)
        off += mc.length
        e
      }
      val idx1 = chunk("idx1", idxEntries.flatMap(_.toSeq).toArray)
      val body = hdrl ++ movi ++ idx1
      cc("RIFF") ++ le32(4 + body.length) ++ cc("AVI ") ++ body
    }

    private def rdLe32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** Walk the RIFF tree and return the raw bytes of every video frame
      * chunk ('NNdc' compressed / 'NNdb' uncompressed), in stream order.
      * Tolerant of unknown chunks (skipped by declared size) and odd
      * sizes (even padding). Non-AVI input yields Nil, never a throw —
      * a corrupt blob in a 100 TB scan must not kill the job.
      */
    def frameChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
          fourcc(bytes, 8) != "AVI ") return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = fourcc(bytes, p)
          val sz = rdLe32(bytes, p + 4)
          val dataStart = p + 8
          // bounds math in Long: a crafted sz near 2^31 overflows the Int
          // sum to negative and would bypass the truncation guard
          if (sz < 0 || dataStart.toLong + sz > to) return // truncated: stop
          if (id == "LIST" && sz >= 4) {
            val lt = fourcc(bytes, dataStart)
            walk(dataStart + 4, dataStart + sz, inMovi || lt == "movi")
          } else if (inMovi && id.length == 4 &&
              (id.endsWith("dc") || id.endsWith("db"))) {
            out += java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + sz)
          }
          // even-padding advance, Long-guarded: when dataStart+sz == to ==
          // Int.MaxValue the +1 pad would wrap p negative and re-enter
          val next = dataStart.toLong + sz + (sz & 1) // chunks pad to even
          if (next > to) return
          p = next.toInt
        }
      }
      // RIFF declares an unsigned 32-bit payload size; read it as such and
      // clamp in Long so a huge/garbage declared size degrades to the real
      // buffer length instead of wrapping negative
      walk(12, math.min(bytes.length.toLong,
        8L + (rdLe32(bytes, 4) & 0xffffffffL)).toInt, inMovi = false)
      out.toSeq
    }

    /** Real frame decode: container parse + ImageIO per frame. Frames
      * ImageIO cannot decode (unknown codec) are dropped, not faked.
      */
    def decodeFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] =
      frameChunks(bytes).flatMap { f =>
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f)))
      }
  }

  /** Media table with REAL video blobs: every odd doc_id becomes an
    * MPNG-in-AVI fixture (encoded on the executors — distributed map
    * work, like the image/audio fixtures). width/height carry the frame
    * dimensions in the canonical media schema.
    */
  def mediaWithRealVideo(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).filter(pmod(col("doc_id"), lit(2)) === 1)
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val (w, h) = VideoCodec.dims(id)
          MediaRow(id, "video", VideoCodec.encodeAvi(id), w, h)
        }
      }
  }

  /** Per-frame decoded pixel statistics: blob gone, one fixed-width row
    * per frame out. Integer channel sums keep the oracle compare exact.
    */
  case class VideoFrameStats(media_id: Long, frame_idx: Long, width: Long,
                             height: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL video decode: AVI bytes → per-frame pixel-sum stats. The
    * frame fan-out happens on the executors inside mapPartitions (one
    * media row becomes nFrames stat rows) and the blob never survives
    * the stage — at scale only the fixed-width stats shuffle.
    */
  def videoFrameStats(media: Dataset[MediaRow]): Dataset[VideoFrameStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        VideoCodec.decodeFrames(r.content).zipWithIndex.map { case (img, f) =>
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          VideoFrameStats(r.media_id, f.toLong, img.getWidth.toLong,
            img.getHeight.toLong, sr, sg, sb)
        }
      }
    }
  }

  /** Media table with near-dup REAL video blobs: odd doc_ids, group =
    * doc_id/10, each member an MPNG-in-AVI whose uniform-gray frames
    * trace the group's 64-window luminance pattern (VideoCodec.dupGray)
    * at a member-specific duration — encoded on the executors like the
    * image/audio fixtures. Frame dims vary per member and cancel out of
    * the fingerprint by construction.
    */
  def mediaWithDupVideo(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).filter(pmod(col("doc_id"), lit(2)) === 1)
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val n = VideoCodec.dupNFrames(id)
          val win = n / 64
          val w = (id % 5).toInt + 6
          val h = (id % 4).toInt + 6
          val grays = Array.tabulate(64)(k => VideoCodec.dupGray(id, k))
          // hand-rolled gray PNG (PngCodec scaladoc): ImageIO's per-call
          // setup at ~100 frames/video dominated this stage 4:1
          val byGray = grays.distinct
            .map(v => v -> PngCodec.encodeGray(w, h, v)).toMap
          val frames = (0 until n).map(i => byGray(grays(i / win)))
          MediaRow(id, "video", VideoCodec.buildAvi(w, h, frames, "MPNG"), w, h)
        }
      }
  }

  case class VideoHash(media_id: Long, fhash: Long)

  /** 64-bit temporal video fingerprint from REAL decoded frames: the
    * frame sequence is cut into 64 equal windows (integer boundaries
    * k·F/64) and bit k is set when window k's mean gray exceeds the
    * whole-video mean — integer cross-multiplication
    * (winLum_k · totalPix > totalLum · winPix_k), bit-reproducible, so
    * the DuckDB oracle derives it analytically for the fixture
    * formulas. Completes the fingerprint-dedup triad with
    * [[imageAHash]] (q117) and [[audioFingerprint]] (q132); feeds the
    * same [[graft.operators.Dedup.hammingNearDup]] banding join. None
    * for non-AVI blobs or videos shorter than 64 decodable frames.
    */
  /** Per-frame (width, height, graySum) from a real AVI blob — the
    * shared decode loop behind [[videoFingerprint]] and
    * [[videoSceneCuts]]: hand-rolled PNG gray sums on the fast path,
    * per-frame ImageIO fallback for MJPG/exotic PNGs; undecodable
    * frames drop.
    */
  private def decodedFrameSums(bytes: Array[Byte]): Seq[(Int, Int, Long)] =
    VideoCodec.frameChunks(bytes).flatMap(decodeFrameSum)

  /** One frame chunk → (width, height, graySum): hand-rolled PNG gray
    * sum on the fast path, ImageIO fallback for MJPG/exotic PNGs; None
    * for an undecodable chunk. The per-frame unit [[decodedFrameSums]]
    * maps over every chunk and [[videoSceneCutsSampled]] over every
    * Nth.
    */
  private def decodeFrameSum(fb: Array[Byte]): Option[(Int, Int, Long)] =
    PngCodec.decodeGraySum(fb).orElse {
      Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(fb))).map { img =>
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            s += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        (img.getWidth, img.getHeight, s)
      }
    }

  def videoFingerprint(bytes: Array[Byte], nWindows: Int = 64): Option[Long] =
    fingerprintOfSums(decodedFrameSums(bytes), nWindows)

  /** [[videoFingerprint]] with every-Nth-frame DECODE — the same
    * keyframe-pipeline tuning as [[videoSceneCutsSampled]] (VERDICT r08
    * #4): the RIFF walk still indexes every chunk, the PNG/JPEG decode
    * (the 7-8×/decade cost at sf1, r7 scaling sweep) runs only on
    * frames 0, every, 2·every, …. The 64 luminance windows are computed
    * over the SAMPLED frame sequence, so for content whose gray is
    * piecewise-constant on runs `every` divides (the standard
    * stable-shot case — and the dup-video fixture exactly) the sampled
    * fingerprint EQUALS the dense one bit-for-bit; `every=1` reproduces
    * [[videoFingerprint]] identically by construction (shared
    * [[fingerprintOfSums]] core, asserted in EntrySpec). None when
    * fewer than nWindows sampled frames decode.
    */
  def videoFingerprintSampled(bytes: Array[Byte], every: Int,
                              nWindows: Int = 64): Option[Long] = {
    require(every >= 1, s"every must be >= 1, got $every")
    val chunks = VideoCodec.frameChunks(bytes)
    val decoded = (0 until chunks.length by every).flatMap(i =>
      decodeFrameSum(chunks(i)))
    fingerprintOfSums(decoded, nWindows)
  }

  /** Shared window-hash core of [[videoFingerprint]] and
    * [[videoFingerprintSampled]]: 64 equal windows over the decoded
    * (w, h, graySum) sequence, bit k set by exact integer
    * cross-multiplication winLum·totalPix > totalLum·winPix.
    */
  private def fingerprintOfSums(decoded: Seq[(Int, Int, Long)],
                                nWindows: Int): Option[Long] = {
    val f = decoded.length
    if (f < nWindows) None
    else {
      val lum = new Array[Long](f)
      val pix = new Array[Long](f)
      var i = 0
      decoded.foreach { case (w, h, s) =>
        lum(i) = s; pix(i) = w.toLong * h
        i += 1
      }
      var totalLum = 0L; var totalPix = 0L
      i = 0
      while (i < f) { totalLum += lum(i); totalPix += pix(i); i += 1 }
      var hash = 0L
      var k = 0
      while (k < nWindows) {
        val lo = (k.toLong * f / nWindows).toInt
        val hi = ((k + 1).toLong * f / nWindows).toInt
        var wl = 0L; var wp = 0L
        i = lo
        while (i < hi) { wl += lum(i); wp += pix(i); i += 1 }
        if (wl * totalPix > totalLum * wp) hash |= 1L << k
        k += 1
      }
      Some(hash)
    }
  }

  case class VideoSceneCuts(media_id: Long, n_frames: Long, n_cuts: Long,
                            first_cut: Long)

  /** Scene-cut detection from REAL decoded frames: a cut at frame i ≥ 1
    * whenever the mean gray differs from frame i-1 — compared by exact
    * integer cross-multiplication (sum_i · pix_{i-1} ≠ sum_{i-1} ·
    * pix_i), no float threshold, so the DuckDB oracle derives cut
    * positions analytically from the fixture's window-gray formula
    * (piecewise-constant windows ⇒ cuts exactly at boundaries whose
    * levels differ). The keyframe-selection primitive: first_cut is the
    * first boundary (-1 for a cut-less video), n_cuts the scene count
    * minus one.
    *
    * Scale: map-only like every multimodal stage — container parse +
    * per-frame decode + the linear cut scan all happen inside
    * mapPartitions; the blob dies in-stage and only four fixed-width
    * columns ride on. Undecodable frames drop (a corrupt frame
    * shortens, never kills); non-video or frame-less blobs drop rows.
    */
  def videoSceneCuts(media: Dataset[MediaRow]): Dataset[VideoSceneCuts] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        if (r.kind != "video") None
        else {
          val f = decodedFrameSums(r.content)
          if (f.isEmpty) None
          else {
            var cuts = 0L
            var first = -1L
            var i = 1
            while (i < f.length) {
              val (w0, h0, s0) = f(i - 1)
              val (w1, h1, s1) = f(i)
              if (s1 * (w0.toLong * h0) != s0 * (w1.toLong * h1)) {
                cuts += 1
                if (first < 0) first = i.toLong
              }
              i += 1
            }
            Some(VideoSceneCuts(r.media_id, f.length.toLong, cuts, first))
          }
        }
      }
    }
  }

  case class VideoSceneCutsSampled(media_id: Long, n_sampled: Long,
                                   n_cuts: Long, first_cut: Long)

  /** [[videoSceneCuts]] with every-Nth-frame DECODE — the standard
    * keyframe-pipeline tuning (VERDICT r07 #6: the video family is
    * decode-dominated at 7-8×/decade). The RIFF walk still indexes
    * every chunk (cheap pointer arithmetic); the PNG/JPEG decode — the
    * actual cost — runs only on frames 0, every, 2·every, …, cutting
    * decode work by `every`×. Cuts are detected between consecutive
    * SAMPLED frames; `first_cut` reports the ORIGINAL frame index of
    * the sample where the change was first seen, so a cut inside a
    * skipped run is attributed to the next sample, and two opposite
    * changes inside one gap cancel — the documented recall/cost trade
    * (exact whenever `every` divides the content's stable-run length,
    * e.g. every=1 reproduces [[videoSceneCuts]] bit-for-bit — asserted
    * in MultimodalSpec). Undecodable sampled frames drop; comparison
    * continues with the next decodable sample.
    */
  def videoSceneCutsSampled(media: Dataset[MediaRow],
                            every: Int): Dataset[VideoSceneCutsSampled] = {
    require(every >= 1, s"every must be >= 1, got $every")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        if (r.kind != "video") None
        else {
          val chunks = VideoCodec.frameChunks(r.content)
          val f = (0 until chunks.length by every)
            .flatMap(i => decodeFrameSum(chunks(i)).map(i -> _))
          if (f.isEmpty) None
          else {
            var cuts = 0L
            var first = -1L
            var j = 1
            while (j < f.length) {
              val (_, (w0, h0, s0)) = f(j - 1)
              val (i1, (w1, h1, s1)) = f(j)
              if (s1 * (w0.toLong * h0) != s0 * (w1.toLong * h1)) {
                cuts += 1
                if (first < 0) first = i1.toLong
              }
              j += 1
            }
            Some(VideoSceneCutsSampled(r.media_id, f.length.toLong, cuts, first))
          }
        }
      }
    }
  }

  /** Fingerprint every video blob: container parse + frame decode die
    * in-stage, an 8-byte hash rides on — the input row to Hamming
    * near-dup banding.
    */
  def videoFingerprints(media: Dataset[MediaRow]): Dataset[VideoHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap(r => videoFingerprint(r.content).map(VideoHash(r.media_id, _)))
    }
  }

  /** [[videoFingerprints]] with every-Nth-frame decode
    * ([[videoFingerprintSampled]] scaladoc for the exactness contract).
    * Same map-only shape: blob dies in-stage, an 8-byte hash rides on.
    */
  def videoFingerprintsSampled(media: Dataset[MediaRow],
                               every: Int): Dataset[VideoHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap(r => videoFingerprintSampled(r.content, every)
        .map(VideoHash(r.media_id, _)))
    }
  }

  /** [[videoFrameStats]] with every-Nth-frame DECODE (VERDICT r08 #4):
    * the RIFF walk indexes every chunk, ImageIO decode (the dominant
    * cost) runs only on container frames 0, every, 2·every, ….
    * `frame_idx` reports the ORIGINAL container frame index — the
    * right key for keyframe pipelines — so on fully-decodable input
    * `every=1` reproduces [[videoFrameStats]] bit-for-bit (asserted in
    * EntrySpec); a video with undecodable frames keeps container
    * indices here where the dense scan renumbers by decode order
    * (documented divergence, corrupt-input only). Map-only like every
    * multimodal stage: the blob dies in-stage, fixed-width stat rows
    * ride on.
    */
  def videoFrameStatsSampled(media: Dataset[MediaRow],
                             every: Int): Dataset[VideoFrameStats] = {
    require(every >= 1, s"every must be >= 1, got $every")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val chunks = VideoCodec.frameChunks(r.content)
        (0 until chunks.length by every).iterator.flatMap { i =>
          Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(chunks(i)))).map { img =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            VideoFrameStats(r.media_id, i.toLong, img.getWidth.toLong,
              img.getHeight.toLong, sr, sg, sb)
          }
        }
      }
    }
  }

  /** Batch feature extraction: mapPartitions keeps the decoder call
    * amortized per partition (a real codec would init once per partition
    * here, not once per row) and streams rows through an iterator.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of the (stub) decoder happens here
      it.map(FakeDecoder.decode)
    }
  }

  /** Synthesize a deterministic media table from the documents table —
    * text bytes standing in for undecodable blobs — exercising the real
    * binary-column schema end-to-end.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, "image").otherwise("audio").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      (pmod(col("doc_id"), lit(64)) + 1).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Feature extraction as a DataFrame (histogram exploded to a stable
    * arity for parquet/oracle friendliness).
    */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(spark, docs)).toDF()
  }

  /** Resize stub: deterministically resample the blob to `w*h` bytes by
    * nearest-neighbor index mapping (a real impl decodes pixels and
    * resamples; the Spark shape — binary in, binary out, metadata
    * updated, map-only — is identical). Rows never widen: the old blob
    * is replaced, not retained.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val n = w * h
      val out = new Array[Byte](n)
      if (r.content.length > 0) {
        var i = 0
        while (i < n) {
          out(i) = r.content((i.toLong * r.content.length / n).toInt)
          i += 1
        }
      }
      r.copy(content = out, width = w, height = h)
    }
  }

  /** One sampled frame of a (stub-decoded) video blob. */
  case class Frame(media_id: Long, frame_idx: Int, n_bytes: Long, byte_mean: Double)

  /** Frame sampling (the UDTF shape: one row in, `nFrames` rows out via
    * flatMap): the blob is cut into `nFrames` contiguous chunks — a real
    * impl would seek keyframes — and each frame row carries fixed-width
    * stats only, so the expansion NARROWS the data (nFrames small rows
    * replace one large blob) instead of multiplying blob bytes through
    * the shuffle.
    */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.content.length
      (0 until nFrames).iterator.map { f =>
        val from = (f.toLong * len / nFrames).toInt
        val until = ((f + 1).toLong * len / nFrames).toInt
        var sum = 0L
        var i = from
        while (i < until) { sum += r.content(i) & 0xff; i += 1 }
        val n = until - from
        val mean = if (n == 0) 0.0 else math.round(sum.toDouble / n * 10000) / 10000.0
        Frame(r.media_id, f, n.toLong, mean)
      }
    }
  }
}
