package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling — SURVEY.md §1.2's
  * htype mapping made concrete: media travel as opaque `binary` payloads
  * beside typed metadata columns (shape, format), exactly how the
  * reference stores compressed samples per tensor
  * (muller/core/sample.py, compression.py:73-101).
  *
  * DECODE is REAL for every codec the JVM can express without extra
  * dependencies: png/jpeg/bmp/gif/wbmp via javax.imageio, WAV (PCM) via
  * javax.sound, FLAC via the in-repo frame decoder ([[FlacFrames]]),
  * ogg-vorbis via the in-repo synthesis decoder ([[VorbisFrames]]), and
  * MJPEG-in-AVI video frames via per-frame JPEG
  * ([[decodeAviMjpegFrames]]) — full pixel/sample access, spec-tested
  * against fixtures. Lossy A/V codecs with no pure-JVM decoder
  * (mp3/opus, and inter-frame video in mp4/mkv or non-MJPEG avi) plus
  * dicom get REAL metadata/header parsing with the full-frame
  * decode left as a clearly-marked deterministic fallback — that
  * boundary, not the whole pipeline, is the stub. Everything around it —
  * the schema contract, the `mapPartitions` batch shape, partition
  * sizing for CPU-bound work, and the feature-extraction plumbing — is
  * the same tested scale path either way; swapping a fallback for
  * javacv (or a Pandas UDF under PySpark) changes ONE function.
  */
object Multimodal {

  /** Standard media-column triple: payload + declared shape + codec tag
    * (reference tensor meta: htype, sample_compression —
    * muller/core/meta/tensor_meta.py:37-49).
    */
  def mediaSchema(prefix: String): Seq[StructField] = Seq(
    StructField(s"${prefix}_bytes", BinaryType),
    StructField(s"${prefix}_shape", ArrayType(IntegerType)),
    StructField(s"${prefix}_format", StringType))

  /** Decoded-image feature row appended by [[decodeImages]]. */
  val decodedMeta: Seq[StructField] = Seq(
    StructField("height", IntegerType), StructField("width", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_intensity", DoubleType))

  /** REAL in-JVM decoder via javax.imageio — covers png/jpeg/bmp/gif/wbmp
    * with zero extra dependencies (the reference's codec matrix,
    * muller/compression.py:73-101, leans on PIL for the same formats).
    * Returns (height, width, channels, meanIntensity) where mean is the
    * exact average over every raster sample (all bands). None when the
    * payload is empty or no registered reader recognizes it.
    */
  private[graft] def decodeJvm(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    if (bytes == null || bytes.isEmpty) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val h = img.getHeight
        val w = img.getWidth
        val raster = img.getRaster
        val bands = raster.getNumBands
        val buf = new Array[Int](w * bands)
        var sum = 0.0
        var y = 0
        while (y < h) {
          raster.getPixels(0, y, w, 1, buf)
          var i = 0
          while (i < buf.length) { sum += buf(i); i += 1 }
          y += 1
        }
        Some((h, w, bands, sum / (h.toLong * w * bands)))
      }
    } catch { case _: Exception => None }
  }

  /** Decode dispatch: the JVM codec first; payloads no reader recognizes
    * (audio/video/dicom — not shipped in-JVM) fall back to the
    * deterministic stub so the pipeline shape stays exercised end-to-end.
    */
  private[graft] def decode(bytes: Array[Byte],
                            declaredShape: Seq[Int]): (Int, Int, Int, Double) =
    decodeJvm(bytes).getOrElse(decodeStub(bytes, declaredShape))

  /** STUB decoder for codecs the JVM does not ship: derives (h, w, c,
    * mean) deterministically from the payload bytes so tests can assert
    * exact values end-to-end.
    */
  private[graft] def decodeStub(bytes: Array[Byte],
                                declaredShape: Seq[Int]): (Int, Int, Int, Double) = {
    val h = if (declaredShape.nonEmpty) declaredShape(0)
            else 1 + math.floorMod(bytes.length, 64)
    val w = if (declaredShape.length > 1) declaredShape(1)
            else 1 + math.floorMod(bytes.length * 31, 64)
    val c = if (declaredShape.length > 2) declaredShape(2) else 3
    val mean = if (bytes.isEmpty) 0.0
               else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    (h, w, c, mean)
  }

  /** Decode + feature-extract over media rows. Structure mirrors a
    * production decode job: repartition by cores (decode is CPU-bound, so
    * partitioning must not follow input file count), then ONE
    * `mapPartitions` pass that batches rows through the (stubbed) codec.
    */
  def decodeImages(df: DataFrame, prefix: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ decodedMeta)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(s"${prefix}_bytes")
    val shapeIdx = df.schema.fieldIndex(s"${prefix}_shape")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](bytesIdx)
          val shape = Option(r.getAs[scala.collection.Seq[Int]](shapeIdx))
            .map(_.toSeq).getOrElse(Seq.empty)
          val (h, w, c, m) = decode(bytes, shape)
          Row.fromSeq(r.toSeq ++ Seq[Any](h, w, c, m))
        }
      }
  }

  // ---- audio decode (reference compression.py audio codecs + sample.py;
  // WAV/PCM decodes for real via javax.sound.sampled — in-JVM, zero
  // dependencies; compressed codecs (mp3/flac) the JVM does not ship fall
  // back to the deterministic stub, same dispatch shape as images) -------

  /** Decoded-audio feature row appended by [[decodeAudio]]. */
  val audioMeta: Seq[StructField] = Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("num_frames", LongType),
    StructField("duration_sec", DoubleType),
    StructField("mean_amplitude", DoubleType))

  /** REAL WAV (PCM signed/unsigned, 8/16-bit, either endianness) decode:
    * (sampleRate, channels, frames, durationSec, meanAbsAmplitude∈[0,1]).
    * None when the payload is not a recognized audio stream or not PCM.
    * The amplitude slot is a boxed Double so metadata-only codecs
    * ([[decodeMp3]]/[[decodeFlac]]) can report null ("not computed")
    * instead of a silent 0.0 ("silence").
    */
  private[graft] def decodeWav(bytes: Array[Byte])
      : Option[(Int, Int, Long, Double, java.lang.Double)] = {
    if (bytes == null || bytes.isEmpty) None
    else try {
      import javax.sound.sampled.{AudioSystem, AudioFormat}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        if (!signed && enc != AudioFormat.Encoding.PCM_UNSIGNED) None
        else if (fmt.getSampleSizeInBits != 8 && fmt.getSampleSizeInBits != 16)
          None
        else {
          val data = in.readAllBytes()
          val bps = fmt.getSampleSizeInBits / 8
          val n = data.length / bps
          var sum = 0.0
          var i = 0
          if (bps == 1) {
            val center = if (signed) 0 else 128
            while (i < n) {
              sum += math.abs((if (signed) data(i).toInt
                else data(i) & 0xff) - center) / 128.0
              i += 1
            }
          } else {
            val big = fmt.isBigEndian
            while (i < n) {
              val lo = if (big) data(2 * i + 1) else data(2 * i)
              val hi = if (big) data(2 * i) else data(2 * i + 1)
              val v = if (signed) (hi.toInt << 8) | (lo & 0xff)
                else (((hi & 0xff) << 8) | (lo & 0xff)) - 32768
              sum += math.abs(v) / 32768.0
              i += 1
            }
          }
          val frames = in.getFrameLength
          Some((fmt.getSampleRate.toInt, fmt.getChannels, frames,
            frames / fmt.getFrameRate.toDouble,
            Double.box(if (n == 0) 0.0 else sum / n)))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  // MPEG audio frame-header tables (public ISO/IEC 11172-3 layout, same
  // values every mp3 tool ships): bitrates in kbps by [version][layer],
  // sample rates by [version]. Index 0 ("free") and 15 are invalid.
  private val mp3BitrateV1 = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // Layer I
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),    // Layer II
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))     // Layer III
  private val mp3BitrateV2 = Array(
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),    // Layer I
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),         // Layer II
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))         // Layer III
  private val mp3Rates = Map( // version bits -> sample-rate table
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000))  // MPEG2.5

  /** REAL mp3 METADATA decode — pure JVM, ~no dependencies: walks the
    * MPEG audio frame headers (skipping any leading ID3v2 tag) and
    * reports (sampleRate, channels, totalSamplesPerChannel, durationSec,
    * null). Amplitude requires full subband synthesis (a native decoder's
    * job), so it is reported as null ("not computed", distinguishable
    * from digital silence) — the other four fields are exact.
    * None unless at least two consecutive valid frames parse (guards
    * against false sync words in arbitrary binaries). Reference decodes
    * mp3 via libsndfile (muller/compression.py:73-101); here the header
    * walk covers the metadata path and the stub boundary is documented.
    */
  private[graft] def decodeMp3(bytes: Array[Byte])
      : Option[(Int, Int, Long, Double, java.lang.Double)] = {
    if (bytes == null || bytes.length < 4) return None
    var p = 0
    // ID3v2: "ID3" + version(2) + flags + 4-byte syncsafe size
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      p = 10 + size
    }
    var frames = 0L
    var samples = 0L
    var rate = 0
    var channels = 0
    var dur = 0.0
    while (p + 4 <= bytes.length) {
      val b1 = bytes(p) & 0xff; val b2 = bytes(p + 1) & 0xff
      val b3 = bytes(p + 2) & 0xff; val b4 = bytes(p + 3) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) {
        // resync only before the first valid frame; garbage AFTER valid
        // frames ends the stream (ID3v1 tail, truncation)
        if (frames == 0) { p += 1 } else p = bytes.length
      } else {
        // byte 2: sync tail + version + layer + crc; byte 3: bitrate +
        // sample rate + padding; byte 4: channel mode + flags
        val version = (b2 >> 3) & 3  // 3=MPEG1 2=MPEG2 0=MPEG2.5 1=reserved
        val layerBits = (b2 >> 1) & 3 // 3=LayerI 2=LayerII 1=LayerIII
        val brIdx = (b3 >> 4) & 0xf
        val srIdx = (b3 >> 2) & 3
        val padding = (b3 >> 1) & 1
        val chMode = (b4 >> 6) & 3
        if (version == 1 || layerBits == 0 || brIdx == 0 || brIdx == 15 ||
            srIdx == 3 || !mp3Rates.contains(version)) {
          if (frames == 0) p += 1 else p = bytes.length
        } else {
          val layer = 3 - layerBits // 0=I 1=II 2=III
          val sr = mp3Rates(version)(srIdx)
          val br = (if (version == 3) mp3BitrateV1 else mp3BitrateV2)(
            layer)(brIdx) * 1000
          val spf = // samples per frame per channel
            if (layer == 0) 384
            else if (layer == 1) 1152
            else if (version == 3) 1152 else 576 // Layer III halves in MPEG2
          val frameLen =
            if (layer == 0) (12 * br / sr + padding) * 4
            else spf / 8 * br / sr + padding
          if (frameLen <= 4) { if (frames == 0) p += 1 else p = bytes.length }
          else {
            frames += 1
            samples += spf
            dur += spf.toDouble / sr
            rate = sr
            channels = if (chMode == 3) 1 else 2
            p += frameLen
          }
        }
      }
    }
    if (frames >= 2) Some((rate, channels, samples, dur, null)) else None
  }

  /** REAL FLAC decode — metadata from the STREAMINFO block every FLAC
    * stream must lead with (public format spec / RFC 9639): "fLaC"
    * magic, block header (type 0, length 34), then 20 bits sample rate,
    * 3 bits channels−1, 5 bits bits-per-sample−1, 36 bits total
    * inter-channel samples — and FULL-SAMPLE amplitude via
    * [[FlacFrames.meanAbs]], a pure-JVM subframe decoder (constant /
    * verbatim / fixed / LPC predictors, Rice residuals, stereo
    * decorrelation). If any frame fails to parse (exotic stream or
    * truncation) the amplitude degrades to null ("not computed") and
    * the four header-derived fields still report — the pre-r12 stub
    * boundary, now only a fallback.
    */
  private[graft] def decodeFlac(bytes: Array[Byte])
      : Option[(Int, Int, Long, Double, java.lang.Double)] = {
    if (bytes == null || bytes.length < 4 + 4 + 34) return None
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' ||
        bytes(3) != 'C') return None
    // first metadata block must be STREAMINFO (type bits 0-6 == 0), 34 long
    val blockType = bytes(4) & 0x7f
    val blockLen = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) |
      (bytes(7) & 0xff)
    if (blockType != 0 || blockLen != 34) return None
    // STREAMINFO offset 8; the rate/channels/bps/samples pack starts at
    // byte 10 of the block (after 2+2 block sizes and 3+3 frame sizes)
    val o = 8 + 10
    def b(i: Int): Long = bytes(o + i) & 0xffL
    val rate = ((b(0) << 12) | (b(1) << 4) | (b(2) >> 4)).toInt // 20 bits
    val channels = (((b(2) >> 1) & 0x7) + 1).toInt              // 3 bits
    val bps = (((b(2) & 1) << 4) | (b(3) >> 4)).toInt + 1       // 5 bits
    val samples = ((b(3) & 0x0fL) << 32) | (b(4) << 24) |       // 36 bits
      (b(5) << 16) | (b(6) << 8) | b(7)
    if (rate <= 0) None // rate 0 is invalid per spec
    else Some((rate, channels, samples, samples.toDouble / rate,
      FlacFrames.meanAbs(bytes, channels, bps)
        .map(Double.box).orNull))
  }

  /** REAL ogg decode — OggS page walk (public Ogg framing + Vorbis I /
    * Opus identification headers): the first page's payload gives the
    * codec, channels and sample rate; the LAST page's granule position
    * is the total PCM sample count (Opus granules always run at 48 kHz,
    * minus the declared pre-skip). For VORBIS payloads the amplitude is
    * computed by FULL synthesis ([[VorbisFrames]] — headers, codebooks,
    * floor1, residue, coupling, iMDCT, overlap-add), degrading to null
    * on any parse failure; Opus needs a SILK/CELT decoder → null, the
    * same boundary as [[decodeMp3]].
    */
  private[graft] def decodeOgg(bytes: Array[Byte])
      : Option[(Int, Int, Long, Double, java.lang.Double)] = {
    if (bytes == null || bytes.length < 58) return None
    def isOggS(p: Int): Boolean =
      bytes(p) == 'O' && bytes(p + 1) == 'g' && bytes(p + 2) == 'g' &&
        bytes(p + 3) == 'S'
    if (!isOggS(0)) return None
    def le32At(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    def le64At(p: Int): Long = le32At(p) | (le32At(p + 4) << 32)
    // first page: header is 27 bytes + segment table; payload follows
    val nSegs0 = bytes(26) & 0xff
    val pay0 = 27 + nSegs0
    if (pay0 + 19 > bytes.length) return None
    def ascii(p: Int, n: Int) = new String(bytes, p, n,
      java.nio.charset.StandardCharsets.US_ASCII)
    val (rate, channels, granulesPerSec, preskip, amp) =
      if (bytes(pay0) == 0x01 && ascii(pay0 + 1, 6) == "vorbis") {
        // 0x01 "vorbis" version(4) channels(1) rate(4 LE)
        val ch = bytes(pay0 + 11) & 0xff
        val r = le32At(pay0 + 12).toInt
        (r, ch, r.toLong, 0L,
          VorbisFrames.meanAbs(bytes).map(Double.box).orNull)
      } else if (ascii(pay0, 8) == "OpusHead") {
        // "OpusHead" version(1) channels(1) preskip(2 LE) inputRate(4 LE)
        val ch = bytes(pay0 + 9) & 0xff
        val r = le32At(pay0 + 12).toInt
        (r, ch, 48000L, (bytes(pay0 + 10) & 0xffL) |
          ((bytes(pay0 + 11) & 0xffL) << 8), null)
      } else return None
    if (rate <= 0 || granulesPerSec <= 0) return None
    // last page: scan backwards for the final OggS capture
    var p = bytes.length - 27
    while (p > 0 && !isOggS(p)) p -= 1
    val granule = le64At(p + 6)
    if (granule < 0) return None
    val samples = math.max(granule - preskip, 0L)
    Some((rate, channels, samples,
      samples.toDouble / granulesPerSec, amp))
  }

  /** STUB audio decode for codecs the JVM lacks: deterministic features
    * from the payload so the pipeline stays testable end-to-end.
    */
  private[graft] def decodeAudioStub(bytes: Array[Byte])
      : (Int, Int, Long, Double, java.lang.Double) = {
    val b = if (bytes == null) Array.emptyByteArray else bytes
    val frames = b.length.toLong
    val mean = if (b.isEmpty) 0.0
               else b.map(x => (x & 0xff).toDouble).sum / b.length / 255.0
    (16000, 1, frames, frames / 16000.0, Double.box(mean))
  }

  /** Decode + feature-extract over audio rows: same repartition-by-cores
    * + one `mapPartitions` pass as [[decodeImages]]; WAV and FLAC decode
    * fully (FLAC via the pure-JVM [[FlacFrames]] subframe decoder),
    * mp3/ogg decode their metadata from headers, anything else goes
    * through the stub. Chain ordered by SPECIFICITY: WAV (container
    * parse), then FLAC / Ogg (exact magics), before the heuristic mp3
    * sync-word scan — a payload that happens to contain two byte runs
    * parsing as consecutive MPEG frames must never win.
    */
  def decodeAudio(df: DataFrame, prefix: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ audioMeta)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(s"${prefix}_bytes")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](bytesIdx)
          val (rate, ch, frames, dur, amp) =
            decodeWav(bytes).orElse(decodeFlac(bytes))
              .orElse(decodeOgg(bytes))
              .orElse(decodeMp3(bytes))
              .getOrElse(decodeAudioStub(bytes))
          Row.fromSeq(r.toSeq ++ Seq[Any](rate, ch, frames, dur, amp))
        }
      }
  }

  // ---- video metadata decode (reference decodes mp4/mkv/avi via the
  // PIL/libsndfile ecosystem, muller/compression.py:73-101; here the
  // ISO BMFF (MPEG-4 Part 12) box walk covers mp4 metadata pure-JVM —
  // the same pattern as the mp3/flac decoders. Full frame decode stays
  // native-codec territory; mkv/avi fall back to the stub.) -------------

  /** Decoded-video feature row appended by [[decodeVideo]]. */
  val videoMeta: Seq[StructField] = Seq(
    StructField("timescale", IntegerType),
    StructField("duration_sec", DoubleType),
    StructField("track_count", IntegerType))

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  private def be64(b: Array[Byte], p: Int): Long =
    ((be32(b, p).toLong & 0xffffffffL) << 32) |
      (be32(b, p + 4).toLong & 0xffffffffL)

  /** Walk ISO BMFF boxes in `b[from, to)`: (type, payloadStart,
    * payloadEnd) per box. Handles 64-bit largesize (size == 1) and
    * to-end-of-enclosure (size == 0); stops at the first malformed box.
    */
  private def walkBoxes(b: Array[Byte], from: Int,
                        to: Int): List[(String, Int, Int)] = {
    val out = List.newBuilder[(String, Int, Int)]
    var p = from
    var ok = true
    while (ok && p + 8 <= to) {
      var size = be32(b, p).toLong & 0xffffffffL
      val typ = new String(b, p + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      var hdr = 8L
      if (size == 1 && p + 16 <= to) { size = be64(b, p + 8); hdr = 16 }
      else if (size == 0) size = (to - p).toLong
      if (size < hdr || p + size > to) ok = false
      else {
        out += ((typ, p + hdr.toInt, p + size.toInt))
        p += size.toInt
      }
    }
    out.result()
  }

  /** Top-level box types that gate the mp4 walk — an ISO BMFF stream
    * must open with one of these, which keeps arbitrary binaries out.
    */
  private val mp4TopBoxes =
    Set("ftyp", "styp", "moov", "mdat", "free", "skip", "wide", "pdin",
      "sidx", "moof")

  /** REAL mp4 METADATA decode — pure-JVM ISO BMFF box walk: finds the
    * `moov` box, reads `mvhd` (version 0 and 1 layouts: timescale,
    * duration) and counts `trak` children. Returns (timescale,
    * durationSec, trackCount); None when the payload is not an ISO BMFF
    * stream or carries no parseable movie header.
    */
  private[graft] def decodeMp4(bytes: Array[Byte])
      : Option[(Int, Double, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    if (!mp4TopBoxes.contains(new String(bytes, 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII))) return None
    walkBoxes(bytes, 0, bytes.length).find(_._1 == "moov")
      .flatMap { case (_, s, e) =>
        val kids = walkBoxes(bytes, s, e)
        val tracks = kids.count(_._1 == "trak")
        kids.find(_._1 == "mvhd").flatMap { case (_, ms, me) =>
          if (me - ms < 4) None
          else (bytes(ms) & 0xff) match {
            // after version(1)+flags(3): v0 = 32-bit creation,
            // modification, timescale, duration; v1 = 64, 64, 32, 64
            case 0 if me - ms >= 20 =>
              val ts = be32(bytes, ms + 12)
              val dur = be32(bytes, ms + 16).toLong & 0xffffffffL
              if (ts <= 0) None else Some((ts, dur.toDouble / ts, tracks))
            case 1 if me - ms >= 32 =>
              val ts = be32(bytes, ms + 20)
              val dur = be64(bytes, ms + 24)
              if (ts <= 0) None else Some((ts, dur.toDouble / ts, tracks))
            case _ => None
          }
        }
      }
  }

  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  /** REAL avi METADATA decode — RIFF chunk walk (public RIFF/AVI layout):
    * "RIFF....AVI ", then the `hdrl` LIST whose first child is the
    * 56-byte `avih` main header (dwMicroSecPerFrame, dwTotalFrames,
    * dwStreams, ...). Returns (fps as timescale, durationSec,
    * streamCount).
    */
  private[graft] def decodeAvi(bytes: Array[Byte])
      : Option[(Int, Double, Int)] = {
    if (bytes == null || bytes.length < 24) return None
    def fourcc(p: Int) = new String(bytes, p, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    // walk top-level chunks for LIST/hdrl, then its children for avih
    def findAvih(from: Int, to: Int): Option[Int] = {
      var p = from
      while (p + 8 <= to) {
        val id = fourcc(p)
        val size = le32(bytes, p + 4).toLong & 0xffffffffL
        if (size < 0 || p + 8 + size > to) return None
        if (id == "avih") return Some(p + 8)
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(p + 8)
          if (listType == "hdrl") {
            val inner = findAvih(p + 12, p + 8 + size.toInt)
            if (inner.isDefined) return inner
          }
        }
        p += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
      }
      None
    }
    findAvih(12, bytes.length).flatMap { o =>
      if (o + 28 > bytes.length) None
      else {
        val usPerFrame = le32(bytes, o).toLong & 0xffffffffL
        val totalFrames = le32(bytes, o + 16).toLong & 0xffffffffL
        val streams = le32(bytes, o + 24)
        if (usPerFrame == 0) None
        else Some(((1000000.0 / usPerFrame).round.toInt,
          totalFrames * usPerFrame / 1e6, streams))
      }
    }
  }

  /** REAL MJPEG-in-AVI FRAME decode — the one video codec family fully
    * decodable pure-JVM: every frame is a baseline JPEG, javax.imageio's
    * native format (the reference decodes video via av,
    * muller/compression.py:73-101; MJPEG needs no inter-frame state).
    * RIFF walk: the `hdrl` LIST's `strl` children locate the first
    * 'vids' stream whose handler (strh fccHandler, or strf
    * biCompression) is MJPG; the `movi` LIST (including `rec ` groups)
    * then yields that stream's `##dc`/`##db` chunks — one JPEG each.
    * Returns per-frame (width, height, meanIntensity ∈ [0,255]); None
    * when the payload is not AVI, has no MJPG video stream, or any
    * sampled frame fails to decode — partial decodes never escape (the
    * [[FlacFrames]]/[[VorbisFrames]] contract).
    */
  private[graft] def decodeAviMjpegFrames(bytes: Array[Byte],
                                          maxFrames: Int = Int.MaxValue)
      : Option[Seq[(Int, Int, Double)]] = {
    if (bytes == null || bytes.length < 24) return None
    def fourcc(p: Int) = new String(bytes, p, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    // (id, payloadStart, payloadEnd) for each chunk in [lo, hi)
    def chunks(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var p = lo
        def hasNext: Boolean = p + 8 <= hi &&
          p + 8 + (le32(bytes, p + 4).toLong & 0xffffffffL) <= hi
        def next(): (String, Int, Int) = {
          val id = fourcc(p)
          val size = (le32(bytes, p + 4).toLong & 0xffffffffL).toInt
          val r = (id, p + 8, p + 8 + size)
          p += 8 + size + (size & 1) // chunks pad to even
          r
        }
      }
    // the MJPG video stream's index = position among ALL strl LISTs
    val mjpgStream: Option[Int] =
      chunks(12, bytes.length).collectFirst {
        case ("LIST", s, e) if e - s >= 4 && fourcc(s) == "hdrl" =>
          chunks(s + 4, e).filter(c =>
              c._1 == "LIST" && c._3 - c._2 >= 4 && fourcc(c._2) == "strl")
            .zipWithIndex.collectFirst(Function.unlift {
              case ((_, ss, se), i) =>
                val kids = chunks(ss + 4, se).toSeq
                val vids = kids.exists { case (id, cs, ce) =>
                  id == "strh" && ce - cs >= 8 &&
                    fourcc(cs) == "vids" &&
                    fourcc(cs + 4).equalsIgnoreCase("MJPG") }
                val vidsStrf = kids.exists { case (id, cs, ce) =>
                  id == "strh" && ce - cs >= 4 && fourcc(cs) == "vids" } &&
                  kids.exists { case (id, cs, ce) =>
                    // BITMAPINFOHEADER biCompression at +16
                    id == "strf" && ce - cs >= 20 &&
                      fourcc(cs + 16).equalsIgnoreCase("MJPG") }
                if (vids || vidsStrf) Some(i) else None
            })
      }.flatten
    mjpgStream.flatMap { stream =>
      val dc = f"$stream%02ddc"; val db = f"$stream%02ddb"
      val frames = Vector.newBuilder[(Int, Int, Double)]
      var count = 0
      var bad = false
      def walkMovi(from: Int, to: Int): Unit =
        for ((id, s, e) <- chunks(from, to) if !bad && count < maxFrames) {
          if (id == "LIST" && e - s >= 4 && fourcc(s) == "rec ")
            walkMovi(s + 4, e)
          else if (id == dc || id == db) {
            decodeJvm(java.util.Arrays.copyOfRange(bytes, s, e)) match {
              case Some((h, w, _, mean)) => frames += ((w, h, mean))
              case None => bad = true // undecodable frame poisons the lot
            }
            count += 1
          }
        }
      for (("LIST", s, e) <- chunks(12, bytes.length)
           if e - s >= 4 && fourcc(s) == "movi")
        walkMovi(s + 4, e)
      val out = frames.result()
      if (bad || out.isEmpty) None else Some(out)
    }
  }

  /** Decoded-frame feature row appended by [[decodeVideoFrames]]. */
  val videoFrameMeta: Seq[StructField] = Seq(
    StructField("frames_decoded", IntegerType),
    StructField("frame_width", IntegerType),
    StructField("frame_height", IntegerType),
    StructField("mean_frame_luma", DoubleType))

  /** Frame-level decode + feature extraction over video rows: MJPEG
    * payloads in AVI decode for REAL (per-frame JPEG via the in-JVM
    * codec — up to `maxFrames` per row bounds the per-row work);
    * anything else (inter-frame codecs with no pure-JVM decoder) reads
    * as null features — distinguishable from a decoded black frame,
    * the same degrade-to-None contract the audio column uses.
    */
  def decodeVideoFrames(df: DataFrame, prefix: String,
                        maxFrames: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ videoFrameMeta)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(s"${prefix}_bytes")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](bytesIdx)
          decodeAviMjpegFrames(bytes, maxFrames) match {
            // frame_width/frame_height describe EVERY decoded frame, so a
            // stream whose frame dimensions vary mid-video poisons the row
            // (null features, the same degrade-to-None contract as an
            // undecodable frame) instead of silently reporting the first
            // frame's size against an all-frame luma mean
            case Some(fs) if fs.forall(f =>
                f._1 == fs.head._1 && f._2 == fs.head._2) =>
              val (w, h) = (fs.head._1, fs.head._2)
              val mean = fs.map(_._3).sum / fs.size
              Row.fromSeq(r.toSeq ++ Seq[Any](fs.size, w, h, mean))
            case _ =>
              Row.fromSeq(r.toSeq ++ Seq[Any](null, null, null, null))
          }
        }
      }
  }

  /** REAL mkv/webm METADATA decode — EBML element walk (public Matroska
    * layout): Segment → Info (TimecodeScale 0x2AD7B1, Duration 0x4489)
    * and Tracks → TrackEntry count. Returns (ticks-per-second as
    * timescale, durationSec, trackCount).
    */
  private[graft] def decodeMkv(bytes: Array[Byte])
      : Option[(Int, Double, Int)] = {
    if (bytes == null || bytes.length < 8) return None
    if ((be32(bytes, 0) & 0xffffffffL) != 0x1a45dfa3L) return None
    // EBML varint: leading zero bits of the first byte give the width.
    // Element IDs keep the marker bit; sizes clear it. All-ones size =
    // "unknown" → extends to the end of the enclosure.
    def vintWidth(p: Int): Int = {
      val b = bytes(p) & 0xff
      if (b == 0) -1 else Integer.numberOfLeadingZeros(b) - 23
    }
    def readId(p: Int): (Long, Int) = {
      val w = vintWidth(p)
      if (w < 1 || p + w > bytes.length) return (-1L, -1)
      var v = 0L
      var i = 0
      while (i < w) { v = (v << 8) | (bytes(p + i) & 0xffL); i += 1 }
      (v, w)
    }
    def readSize(p: Int): (Long, Int) = {
      val w = vintWidth(p)
      if (w < 1 || p + w > bytes.length) return (-1L, -1)
      var v = (bytes(p) & 0xffL) & ((1L << (8 - w)) - 1)
      var i = 1
      var allOnes = v == (1L << (8 - w)) - 1
      while (i < w) {
        val byte = bytes(p + i) & 0xffL
        if (byte != 0xffL) allOnes = false
        v = (v << 8) | byte
        i += 1
      }
      (if (allOnes) -2L else v, w) // -2 = unknown size
    }
    // children of [from, to) as (id, payloadStart, payloadEnd)
    def children(from: Int, to: Int): List[(Long, Int, Int)] = {
      val out = List.newBuilder[(Long, Int, Int)]
      var p = from
      var ok = true
      while (ok && p + 2 <= to) {
        val (id, iw) = readId(p)
        if (iw < 0) ok = false
        else {
          val (sz, sw) = readSize(p + iw)
          if (sw < 0) ok = false
          else {
            val start = p + iw + sw
            val end =
              if (sz == -2L) to
              else if (start + sz > to) { ok = false; to }
              else start + sz.toInt
            if (ok) { out += ((id, start, end)); p = end }
          }
        }
      }
      out.result()
    }
    def uint(s: Int, e: Int): Long = {
      var v = 0L; var i = s
      while (i < e) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
      v
    }
    def float(s: Int, e: Int): Double = (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(be32(bytes, s)).toDouble
      case 8 => java.lang.Double.longBitsToDouble(be64(bytes, s))
      case _ => 0.0
    }
    children(0, bytes.length).find(_._1 == 0x18538067L) // Segment
      .flatMap { case (_, ss, se) =>
        val segKids = children(ss, se)
        val tracks = segKids.find(_._1 == 0x1654ae6bL) // Tracks
          .map { case (_, ts, te) =>
            children(ts, te).count(_._1 == 0xaeL) }    // TrackEntry
          .getOrElse(0)
        segKids.find(_._1 == 0x1549a966L)              // Info
          .flatMap { case (_, is, ie) =>
            val info = children(is, ie)
            val scaleNs = info.find(_._1 == 0x2ad7b1L) // TimecodeScale
              .map { case (_, s, e) => uint(s, e) }.getOrElse(1000000L)
            val durTicks = info.find(_._1 == 0x4489L)  // Duration
              .map { case (_, s, e) => float(s, e) }.getOrElse(0.0)
            if (scaleNs <= 0) None
            else Some(((1e9 / scaleNs).round.toInt,
              durTicks * scaleNs / 1e9, tracks))
          }
      }
  }

  /** STUB video decode for payloads no container parser recognizes:
    * deterministic features from the payload, same boundary pattern as
    * [[decodeAudioStub]].
    */
  private[graft] def decodeVideoStub(bytes: Array[Byte])
      : (Int, Double, Int) = {
    val n = if (bytes == null) 0 else bytes.length
    (1000, n / 1000.0, 1)
  }

  /** Decode + feature-extract over video rows: mp4 (ISO BMFF), avi
    * (RIFF) and mkv/webm (EBML) metadata decode for real — each gated
    * on its container magic — anything else goes through the stub.
    */
  def decodeVideo(df: DataFrame, prefix: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ videoMeta)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(s"${prefix}_bytes")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](bytesIdx)
          val (ts, dur, tracks) =
            decodeMp4(bytes).orElse(decodeAvi(bytes))
              .orElse(decodeMkv(bytes))
              .getOrElse(decodeVideoStub(bytes))
          Row.fromSeq(r.toSeq ++ Seq[Any](ts, dur, tracks))
        }
      }
  }

  // ---- medical volume (nifti-1) header decode (reference declares the
  // nifti htype, muller/core/types/htype.py:202; the nifti-1 header is a
  // public fixed 348-byte struct — dims, datatype, voxel sizes — so the
  // metadata path is real; dicom stays stubbed (legitimately large
  // format)) --------------------------------------------------------------

  /** Decoded-volume feature row appended by [[decodeVolumes]]. */
  val volumeMeta: Seq[StructField] = Seq(
    StructField("ndim", IntegerType),
    StructField("dims", ArrayType(IntegerType, containsNull = false)),
    StructField("datatype", IntegerType),
    StructField("bitpix", IntegerType),
    StructField("voxel_sizes", ArrayType(FloatType, containsNull = false)),
    StructField("modality", StringType))

  /** REAL nifti-1 HEADER decode: `sizeof_hdr == 348` (read in both byte
    * orders — the field doubles as the endianness probe) and magic
    * `n+1\0`/`ni1\0` at offset 344 gate the parse; then dim[8] shorts at
    * 40, datatype/bitpix shorts at 70/72, pixdim[8] floats at 76.
    * Returns (dims, datatype, bitpix, voxelSizes).
    */
  private[graft] def decodeNifti1(bytes: Array[Byte])
      : Option[(Seq[Int], Int, Int, Seq[Float])] = {
    if (bytes == null || bytes.length < 348) return None
    def i32(p: Int, le: Boolean): Int =
      if (le) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
        ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
      else be32(bytes, p)
    val le =
      if (i32(0, le = true) == 348) true
      else if (i32(0, le = false) == 348) false
      else return None
    def i16(p: Int): Int =
      if (le) (bytes(p) & 0xff) | (bytes(p + 1).toInt << 8)
      else (bytes(p).toInt << 8) | (bytes(p + 1) & 0xff)
    def f32(p: Int): Float = java.lang.Float.intBitsToFloat(i32(p, le))
    val magic = new String(bytes, 344, 3,
      java.nio.charset.StandardCharsets.US_ASCII)
    if ((magic != "n+1" && magic != "ni1") || bytes(347) != 0) return None
    val ndim = i16(40)
    if (ndim < 1 || ndim > 7) return None
    val dims = (1 to ndim).map(k => i16(40 + 2 * k))
    val voxels = (1 to ndim).map(k => f32(76 + 4 * k))
    Some((dims, i16(70), i16(72), voxels))
  }

  /** REAL dicom BASIC METADATA decode — DICM magic at offset 128, then
    * the Part-10 file-meta group (always explicit-VR little-endian) for
    * the TransferSyntaxUID, then a dataset element walk in the declared
    * encoding (implicit or explicit VR LE) collecting Rows (0028,0010),
    * Columns (0028,0011), BitsAllocated (0028,0100), PixelSpacing
    * (0028,0030) and Modality (0008,0060). Stops at PixelData, an
    * undefined-length element, or retired big-endian syntax (→ None /
    * partial). Full pixel decode stays out of scope — this covers the
    * same metadata surface the nifti path does. Returns
    * ((rows, cols), bitsAllocated, pixelSpacing, modality).
    */
  private[graft] def decodeDicom(bytes: Array[Byte])
      : Option[(Seq[Int], Int, Seq[Float], String)] = {
    if (bytes == null || bytes.length < 140) return None
    if (bytes(128) != 'D' || bytes(129) != 'I' || bytes(130) != 'C' ||
      bytes(131) != 'M') return None
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def u32(p: Int): Long = (u16(p).toLong & 0xffffL) |
      ((u16(p + 2).toLong & 0xffffL) << 16)
    def str(p: Int, n: Int): String = new String(bytes, p, n,
      java.nio.charset.StandardCharsets.US_ASCII).trim
    val longVRs = Set("OB", "OW", "OF", "SQ", "UT", "UN")
    var transferSyntax = "1.2.840.10008.1.2.1" // explicit LE default
    var rows = -1; var cols = -1; var bits = -1
    var spacing: Seq[Float] = Seq.empty
    var modality: String = null
    var p = 132
    var implicitVR = false
    var inMeta = true
    var done = false
    while (!done && p + 8 <= bytes.length) {
      val group = u16(p)
      val elem = u16(p + 2)
      if (inMeta && group != 0x0002) {
        // meta group ends; dataset encoding per the declared syntax
        inMeta = false
        if (transferSyntax == "1.2.840.10008.1.2") implicitVR = true
        else if (transferSyntax == "1.2.840.10008.1.2.2") done = true // BE
      }
      if (!done) {
        // element header: VR-dependent length field placement
        val explicit = inMeta || !implicitVR
        val vr = if (explicit) str(p + 4, 2) else ""
        val (len, hdr) =
          if (!explicit) (u32(p + 4), 8)
          else if (longVRs.contains(vr)) (u32(p + 8), 12)
          else (u16(p + 6).toLong, 8)
        val vp = p + hdr // value offset
        if (len == 0xffffffffL || vp + len > bytes.length) done = true
        else {
          (group, elem) match {
            case (0x0002, 0x0010) => transferSyntax = str(vp, len.toInt)
              .replace(" ", "")
            case (0x0008, 0x0060) => modality = str(vp, len.toInt)
            case (0x0028, 0x0010) if len >= 2 => rows = u16(vp)
            case (0x0028, 0x0011) if len >= 2 => cols = u16(vp)
            case (0x0028, 0x0100) if len >= 2 => bits = u16(vp)
            case (0x0028, 0x0030) => // DS pair "row\col" in mm
              spacing = str(vp, len.toInt).split('\\').toSeq
                .flatMap(s => scala.util.Try(s.trim.toFloat).toOption)
            case (0x7fe0, 0x0010) => done = true // pixel data: all found
            case _ => ()
          }
          p = vp + len.toInt
        }
      }
    }
    if (rows > 0 && cols > 0)
      Some((Seq(rows, cols), math.max(bits, 0), spacing, modality))
    else None
  }

  /** STUB volume decode for undecodable medical payloads: deterministic
    * shape from the payload length.
    */
  private[graft] def decodeVolumeStub(bytes: Array[Byte])
      : (Seq[Int], Int, Int, Seq[Float]) = {
    val n = if (bytes == null) 0 else bytes.length
    (Seq(1 + n % 32, 1 + (n * 31) % 32, 1), 2 /* uint8 */, 8,
      Seq(1.0f, 1.0f, 1.0f))
  }

  /** Decode + feature-extract over medical-volume rows: nifti-1 headers
    * and dicom Part-10 basic metadata decode for real; anything else
    * goes through the stub. `datatype` is the nifti code (-1 for dicom,
    * which has no nifti datatype; bit width rides in `bitpix`);
    * `modality` is dicom-only (null elsewhere).
    */
  def decodeVolumes(df: DataFrame, prefix: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ volumeMeta)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(s"${prefix}_bytes")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](bytesIdx)
          val (dims, dt, bp, vox, modality) =
            decodeNifti1(bytes)
              .map { case (d, t, b, v) => (d, t, b, v, null: String) }
              .orElse(decodeDicom(bytes).map { case (d, b, v, m) =>
                (d, -1, b, v, m) })
              .getOrElse {
                val (d, t, b, v) = decodeVolumeStub(bytes)
                (d, t, b, v, null: String)
              }
          Row.fromSeq(r.toSeq ++
            Seq[Any](dims.length, dims, dt, bp, vox, modality))
        }
      }
  }

  // ---- image processing helpers (reference core/image/processing.py:
  // mode conversion with the 299/587/114 luma weights; util/exif.py:
  // EXIF tag extraction with named orientation values) -------------------

  private def readImage(bytes: Array[Byte])
      : Option[(java.awt.image.BufferedImage, String)] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        r.setInput(iis)
        val fmt = r.getFormatName.toLowerCase
        val img = r.read(0)
        r.dispose()
        Some((img, fmt))
      }
    } catch { case _: Exception => None }

  /** None when no writer handles `fmt` for this image (ImageIO.write
    * returns false, or the writer throws — e.g. wbmp on non-bilevel):
    * callers pass the original payload through rather than crash the
    * task or store zero bytes.
    */
  private def encodeImage(img: java.awt.image.BufferedImage,
                          fmt: String): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      if (javax.imageio.ImageIO.write(img, fmt, out)) Some(out.toByteArray)
      else None
    } catch { case _: Exception => None }

  /** Grayscale with the reference's exact integer luma:
    * `floor((299·R + 587·G + 114·B) / 1000)` (processing.py:40-43).
    */
  private[graft] def toGrayscale(img: java.awt.image.BufferedImage)
      : java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val l = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
        out.getRaster.setSample(x, y, 0, l)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Convert decodable payloads to a target mode (`"L"` grayscale or
    * `"RGB"`), re-encoding in the original format; payloads no codec
    * recognizes pass through unchanged (reference convert_sample returns
    * the sample as-is when already in the mode).
    */
  def convertImages(df: DataFrame, prefix: String, mode: String): DataFrame = {
    require(mode == "L" || mode == "RGB", s"unsupported mode $mode")
    implicit val enc = RowEncoder.encoderFor(df.schema)
    val bytesIdx = df.schema.fieldIndex(s"${prefix}_bytes")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](bytesIdx)
          (readImage(bytes) match {
            case Some((img, fmt)) =>
              val converted =
                if (mode == "L") toGrayscale(img)
                else {
                  val out = new java.awt.image.BufferedImage(img.getWidth,
                    img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g = out.createGraphics()
                  g.drawImage(img, 0, 0, null); g.dispose()
                  out
                }
              encodeImage(converted, fmt)
                .map(b => Row.fromSeq(r.toSeq.updated(bytesIdx, b)))
            case None => None
          }).getOrElse(r)
        }
      }
  }

  /** REAL pixel resize (Graphics2D scale-draw), re-encoded in the
    * original format; undecodable payloads pass through.
    */
  def resizeImages(df: DataFrame, prefix: String, h: Int, w: Int): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(df.schema)
    val bytesIdx = df.schema.fieldIndex(s"${prefix}_bytes")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          (readImage(r.getAs[Array[Byte]](bytesIdx)) match {
            case Some((img, fmt)) =>
              val gray = img.getType ==
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY
              val out = new java.awt.image.BufferedImage(w, h,
                if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
                else java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.drawImage(img, 0, 0, w, h, null); g.dispose()
              encodeImage(out, fmt)
                .map(b => Row.fromSeq(r.toSeq.updated(bytesIdx, b)))
            case None => None
          }).getOrElse(r)
        }
      }
  }

  /** Resize plan: emits the target shape column (the pixel work happens
    * inside the decode stub in this environment). Kept as an expression —
    * no UDF — so it stays in codegen.
    */
  def resizePlan(df: DataFrame, prefix: String, h: Int, w: Int): DataFrame =
    df.withColumn(s"${prefix}_shape",
      when(col(s"${prefix}_shape").isNotNull && size(col(s"${prefix}_shape")) > 2,
        array(lit(h), lit(w), element_at(col(s"${prefix}_shape"), 3)))
        .otherwise(array(lit(h), lit(w))))

  // ---- tiled ingest for huge samples (reference muller/api/tiled.py +
  // core/tiling: oversized samples span chunks; here they span ROWS, so
  // no row ever exceeds a bounded payload and shuffles/page sizes stay
  // healthy at 100 TB) -------------------------------------------------

  /** Split oversized payloads into bounded tile rows
    * `(…, tile_index, tile_bytes)` — pure expressions (sequence explode +
    * binary substring), no UDF. Rows at or under `tileBytes` emit one
    * tile. NULL payloads emit a single null tile (round-trips).
    */
  def tile(df: DataFrame, prefix: String, tileBytes: Int): DataFrame = {
    require(tileBytes > 0)
    val b = col(s"${prefix}_bytes")
    val nTiles = when(b.isNull || length(b) === 0, lit(1))
      .otherwise(ceil(length(b).cast("double") / lit(tileBytes)).cast("int"))
    df.withColumn("tile_index",
        explode(sequence(lit(0), nTiles - 1)))
      .withColumn("tile_bytes",
        when(b.isNull, lit(null).cast(BinaryType))
          .otherwise(substring(b, col("tile_index") * tileBytes + 1,
            lit(tileBytes))))
      .drop(s"${prefix}_bytes")
  }

  /** Reassemble tiled rows back into whole payloads: group by the given
    * keys, order tiles by index, binary-concat — one aggregation, no
    * driver materialization. Inverse of [[tile]].
    */
  def assemble(df: DataFrame, prefix: String, keyCols: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(c =>
      keyCols.contains(c) || c == "tile_index" || c == "tile_bytes")
    val aggs =
      aggregate(
        transform(
          array_sort(collect_list(struct(col("tile_index"), col("tile_bytes")))),
          t => t.getField("tile_bytes")),
        lit(Array.emptyByteArray),
        (acc, t) => concat(acc, t)).as(s"${prefix}_bytes") +:
        others.map(c => first(col(c)).as(c))
    df.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((keyCols ++ others).map(col) :+ col(s"${prefix}_bytes"): _*)
  }

  /** Frame sampling for video payloads: one output row per sampled frame
    * index — pure plan-side explode; the actual frame extraction belongs
    * to the decode stage.
    */
  def sampleFrames(df: DataFrame, frameCountCol: String,
                   everyN: Int): DataFrame =
    df.withColumn("frame_index",
      explode(sequence(lit(0), greatest(col(frameCountCol) - 1, lit(0)),
        lit(everyN))))
}
