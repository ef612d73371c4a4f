package graft.operators

/** Pure-JVM FLAC audio-frame decoder (public format spec, RFC 9639) —
  * the full-sample path behind [[Multimodal.decodeFlac]]'s amplitude
  * column. Decodes every frame of a stream: frame headers (coded block
  * size / sample rate / channel assignment), subframes of all four
  * types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32),
  * Rice-coded residuals (both 4-bit and 5-bit parameter widths, escape
  * partitions), wasted-bits shifts, and the three stereo decorrelation
  * modes (left/side, right/side, mid/side).
  *
  * The reference decodes FLAC natively via libsndfile
  * (muller/compression.py:73-101) and returns PCM arrays; here the
  * decoded PCM is folded into the pipeline's amplitude feature without
  * materializing it (executors stream the fold — constant memory per
  * row regardless of audio length). Only CRC VALIDATION is skipped
  * (checksums guard transport, not semantics); any structural parse
  * failure aborts to None and the caller degrades to metadata-only.
  */
private[operators] object FlacFrames {

  /** MSB-first bit reader over a byte array. Throws past-end — callers
    * catch and treat as parse failure. */
  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var pos: Long = startByte.toLong * 8
    private val end: Long = bytes.length.toLong * 8
    def bitPos: Long = pos
    def atEnd: Boolean = pos >= end
    def bit(): Int = {
      if (pos >= end) throw new IndexOutOfBoundsException
      val b = (bytes((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      b
    }
    /** Up to 32 bits, MSB first, as unsigned in a Long. */
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** n-bit two's-complement signed value. */
    def signedBits(n: Int): Long = {
      val v = bits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Count of 0 bits before the terminating 1 (Rice quotient). */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) q += 1
      q
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
  }

  private val RateCodes = Array(-1, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)

  /** Mean absolute amplitude in [0,1] over every decoded sample of every
    * channel, or None if any frame fails structural parse. `channels`
    * and `bps` come from STREAMINFO; a frame header may OVERRIDE the
    * sample size (sizeCode 1-7), so normalization uses the bps each
    * frame's samples were actually decoded at, not the stream default.
    */
  def meanAbs(bytes: Array[Byte], channels: Int, bps: Int)
      : Option[Double] = {
    try {
      // skip the metadata chain: each header is lastFlag(1) type(7) len(24)
      var p = 4
      var last = false
      while (!last) {
        if (p + 4 > bytes.length) return None
        last = (bytes(p) & 0x80) != 0
        val len = ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        p += 4 + len
      }
      if (p > bytes.length) return None
      val br = new BitReader(bytes, p)
      var sumAbs = 0.0
      var count = 0L
      while (!br.atEnd) {
        decodeFrame(br, channels, bps) match {
          case null => return None
          case frame =>
            val full = (1L << (frame.bps - 1)).toDouble
            val chans = frame.chans
            var c = 0
            while (c < chans.length) {
              val s = chans(c)
              var i = 0
              while (i < s.length) {
                sumAbs += math.min(math.abs(s(i)) / full, 1.0)
                i += 1
              }
              count += s.length
              c += 1
            }
        }
        // a next frame must lead with a 0xff sync byte; a zero byte here
        // is trailing padding, not a frame — stop cleanly
        if (!br.atEnd && bytes((br.bitPos >> 3).toInt) == 0)
          return if (count == 0) None else Some(sumAbs / count)
      }
      if (count == 0) None else Some(sumAbs / count)
    } catch { case _: Exception => None }
  }

  /** One decoded frame: per-channel sample arrays plus the bps the
    * samples were coded at (the frame header can override STREAMINFO).
    */
  private final class Frame(val chans: Array[Array[Long]], val bps: Int)

  /** One frame → decoded [[Frame]], or null on parse failure. */
  private def decodeFrame(br: BitReader, siChannels: Int,
                          siBps: Int): Frame = {
    // sync (14) + reserved (1) + blocking strategy (1)
    if (br.bits(14) != 0x3ffe) return null
    br.bits(2) // reserved + blocking strategy
    val bsCode = br.bits(4).toInt
    val rateCode = br.bits(4).toInt
    val chanAssign = br.bits(4).toInt
    val sizeCode = br.bits(3).toInt
    br.bit() // reserved
    // UTF-8-coded frame/sample number: leading-ones count = extra bytes
    val first = br.bits(8).toInt
    var extra = 0
    var mask = 0x80
    while ((first & mask) != 0) { extra += 1; mask >>= 1 }
    if (extra > 0) extra -= 1 // 0b10xxxxxx is invalid as a lead, 0b110 → 1
    var i = 0
    while (i < extra) { br.bits(8); i += 1 }
    val blockSize = bsCode match {
      case 0 => return null // reserved
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => br.bits(8).toInt + 1
      case 7 => br.bits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    rateCode match { // value only needed from STREAMINFO; skip coded forms
      case 12 => br.bits(8)
      case 13 | 14 => br.bits(16)
      case 15 => return null // invalid
      case _ => ()
    }
    val bps = sizeCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 3 => return null // reserved
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
    }
    br.bits(8) // header CRC-8 (validation skipped)
    val nCh = if (chanAssign < 8) chanAssign + 1 else 2
    if (chanAssign < 8 && nCh != siChannels) return null
    val out = new Array[Array[Long]](nCh)
    var c = 0
    while (c < nCh) {
      // side channels carry one extra bit (they hold a difference)
      val chBps = chanAssign match {
        case 8 => if (c == 1) bps + 1 else bps  // left/side
        case 9 => if (c == 0) bps + 1 else bps  // side/right
        case 10 => if (c == 1) bps + 1 else bps // mid/side
        case _ => bps
      }
      val s = decodeSubframe(br, blockSize, chBps)
      if (s == null) return null
      out(c) = s
      c += 1
    }
    // undo stereo decorrelation (all arithmetic exact in Long)
    chanAssign match {
      case 8 => // left/side: right = left − side
        var j = 0
        while (j < blockSize) { out(1)(j) = out(0)(j) - out(1)(j); j += 1 }
      case 9 => // side/right: left = right + side
        var j = 0
        while (j < blockSize) {
          val side = out(0)(j)
          out(0)(j) = out(1)(j) + side
          j += 1
        }
      case 10 => // mid/side
        var j = 0
        while (j < blockSize) {
          val side = out(1)(j)
          val mid = (out(0)(j) << 1) | (side & 1L)
          out(0)(j) = (mid + side) >> 1
          out(1)(j) = (mid - side) >> 1
          j += 1
        }
      case _ => ()
    }
    br.alignByte()
    br.bits(16) // frame CRC-16 (validation skipped)
    new Frame(out, bps)
  }

  private def decodeSubframe(br: BitReader, n: Int,
                             bpsIn: Int): Array[Long] = {
    if (br.bit() != 0) return null // mandatory zero pad bit
    val tpe = br.bits(6).toInt
    val wasted =
      if (br.bit() == 1) br.unary() + 1
      else 0
    val bps = bpsIn - wasted
    val s: Array[Long] = tpe match {
      case 0 => // CONSTANT
        val v = br.signedBits(bps)
        Array.fill(n)(v)
      case 1 => // VERBATIM
        val a = new Array[Long](n)
        var i = 0
        while (i < n) { a(i) = br.signedBits(bps); i += 1 }
        a
      case t if t >= 8 && t <= 12 => // FIXED, order = t − 8
        val order = t - 8
        val a = new Array[Long](n)
        var i = 0
        while (i < order) { a(i) = br.signedBits(bps); i += 1 }
        if (!readResiduals(br, a, n, order)) return null
        i = order
        while (i < n) {
          a(i) += (order match {
            case 0 => 0L
            case 1 => a(i - 1)
            case 2 => 2 * a(i - 1) - a(i - 2)
            case 3 => 3 * a(i - 1) - 3 * a(i - 2) + a(i - 3)
            case 4 => 4 * a(i - 1) - 6 * a(i - 2) + 4 * a(i - 3) - a(i - 4)
          })
          i += 1
        }
        a
      case t if t >= 32 => // LPC, order = low 5 bits + 1
        val order = (t & 0x1f) + 1
        val a = new Array[Long](n)
        var i = 0
        while (i < order) { a(i) = br.signedBits(bps); i += 1 }
        val precision = br.bits(4).toInt + 1
        if (precision == 16) return null // 0b1111 is invalid per spec
        val shift = br.signedBits(5).toInt
        if (shift < 0) return null
        val coefs = new Array[Long](order)
        i = 0
        while (i < order) { coefs(i) = br.signedBits(precision); i += 1 }
        if (!readResiduals(br, a, n, order)) return null
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * a(i - 1 - j); j += 1 }
          a(i) += (acc >> shift)
          i += 1
        }
        a
      case _ => return null // reserved subframe types
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { s(i) <<= wasted; i += 1 }
    }
    s
  }

  /** Rice-partitioned residuals, written into a(order until n).
    * Returns false on structural invalidity. */
  private def readResiduals(br: BitReader, a: Array[Long], n: Int,
                            order: Int): Boolean = {
    val method = br.bits(2).toInt
    if (method > 1) return false
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val po = br.bits(4).toInt
    val partitions = 1 << po
    if (n % partitions != 0) return false
    val psize = n >> po
    if (psize <= order && partitions == 1) return false
    var idx = order
    var p = 0
    while (p < partitions) {
      val cnt = if (p == 0) psize - order else psize
      if (cnt < 0) return false
      val param = br.bits(paramBits).toInt
      if (param == escape) {
        val raw = br.bits(5).toInt
        var i = 0
        while (i < cnt) {
          a(idx) = if (raw == 0) 0L else br.signedBits(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.unary().toLong
          val r = br.bits(param)
          val v = (q << param) | r
          a(idx) = (v >>> 1) ^ -(v & 1L) // zigzag → signed
          idx += 1; i += 1
        }
      }
      p += 1
    }
    true
  }
}
