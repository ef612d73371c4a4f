package graft.operators

/** Pure-JVM Vorbis I audio synthesis — the one lossy codec fully
  * decodable without native libraries, closing the mp3/ogg "metadata
  * only" boundary for ogg-vorbis payloads (reference decodes via
  * libsndfile/PIL, muller/compression.py:73-101; this implements the
  * public Vorbis I specification directly).
  *
  * Scope: complete header + audio-packet decode — Ogg page/packet
  * reassembly (continued packets included), LSB-first bit unpacking,
  * Huffman codebooks (spec 3.2.1 canonical assignment) with type-1/2 VQ
  * lookups, floor type 1 (two-stage prediction + Bresenham line render
  * through the inverse-dB table), all three residue types (0's stride
  * interleave, 1's sequential walk, 2's channel interleave), channel
  * coupling (square polar), the direct-form inverse MDCT, and the
  * general unequal-blocksize window overlap-add (center-aligned slopes).
  * Floor type 0 (LSP, emitted by no known encoder) raises — the caller
  * degrades to metadata-only, the same parse-fail contract
  * [[FlacFrames]] uses. The iMDCT runs an O(n log n) FFT factorization
  * of the spec 4.3.6 sum (input rotation → length-n inverse DFT →
  * output rotation), dependency-free; the direct O(n²) spec
  * transcription is kept as [[imdctDirect]] and a randomized spec
  * cross-checks the two to float precision.
  *
  * Every failure path throws internally and [[meanAbs]] returns None —
  * callers never see a partial decode.
  */
private[operators] object VorbisFrames {

  /** Mean |amplitude| ∈ [0,1] over all decoded PCM samples of an
    * ogg-vorbis stream, all channels; None when the stream is not
    * decodable (wrong codec, exotic config, truncation).
    */
  def meanAbs(ogg: Array[Byte]): Option[Double] =
    try {
      val packets = oggPackets(ogg)
      if (packets.length < 4) return None // ident+comment+setup+audio
      val id = identHeader(packets(0))
      // packets(1) is the comment header — type-checked, content ignored
      require((packets(1)(0) & 0xff) == 3, "expected comment header")
      val setup = setupHeader(packets(2), id)
      val granule = lastGranule(ogg)
      var sum = 0.0
      var n = 0L
      val dec = new Synthesizer(id, setup)
      for (p <- packets.drop(3)) {
        val out = dec.decodePacket(p)
        var i = 0
        while (i < out.length && (granule < 0 || n < granule * id.channels)) {
          val v = math.max(-1.0f, math.min(1.0f, out(i)))
          sum += math.abs(v)
          n += 1
          i += 1
        }
      }
      // belt over the braces above: any non-finite value that slips
      // through arithmetic (NaN propagates through min/max clamps)
      // degrades rather than escaping as a poisoned amplitude
      if (n == 0 || !java.lang.Double.isFinite(sum)) None
      else Some(sum / n)
    } catch { case _: Exception => None }

  // ---- Ogg layer ----------------------------------------------------------

  /** Reassemble the logical packets of the FIRST logical stream: walk
    * pages, concatenate segments (a 255 lacing value continues the
    * packet, across pages too). CRCs are not verified — a corrupt
    * stream fails structurally downstream, and the caller's contract is
    * best-effort decode, not integrity audit.
    */
  private def oggPackets(b: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var cur = new java.io.ByteArrayOutputStream()
    var open = false // a packet is mid-assembly (last lacing was 255)
    var serial = java.lang.Long.MIN_VALUE
    var p = 0
    while (p + 27 <= b.length) {
      require(b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' &&
        b(p + 3) == 'S', s"bad ogg capture at $p")
      val pageSerial = le32(b, p + 14)
      val nSegs = b(p + 26) & 0xff
      var q = p + 27 + nSegs
      if (serial == java.lang.Long.MIN_VALUE) serial = pageSerial
      val ours = pageSerial == serial
      var s = 0
      while (s < nSegs) {
        val lace = b(p + 27 + s) & 0xff
        if (ours) {
          cur.write(b, q, lace)
          if (lace < 255) { out += cur.toByteArray; cur.reset(); open = false }
          else open = true
        }
        q += lace
        s += 1
      }
      p = q
    }
    require(!open || cur.size == 0, "truncated final packet")
    out.result()
  }

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** Granule position of the last page = total PCM samples (per
    * channel pair position in vorbis); -1 when absent. */
  private def lastGranule(b: Array[Byte]): Long = {
    var p = b.length - 27
    while (p > 0 && !(b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' &&
      b(p + 3) == 'S')) p -= 1
    if (p < 0) -1L
    else le32(b, p + 6) | (le32(b, p + 10) << 32)
  }

  // ---- bit reader (vorbis packs LSB-first within each byte) ---------------

  /** End-of-packet: a TYPED signal, because its handling is contextual
    * — fatal in headers (truncated stream → degrade to metadata), but
    * NORMAL during an audio packet's floor/residue decode, where the
    * spec's practice (libvorbis/stb alike) is to keep what was decoded
    * and leave the remainder zero. */
  private final class EopException extends RuntimeException("end of packet")

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0 // absolute bit position
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteI = pos >>> 3
        if (byteI >= b.length) throw new EopException
        v |= (((b(byteI) >> (pos & 7)) & 1) << i)
        pos += 1
        i += 1
      }
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        val byteI = pos >>> 3
        if (byteI >= b.length) throw new EopException
        v |= (((b(byteI) >> (pos & 7)) & 1).toLong << i)
        pos += 1
        i += 1
      }
      v
    }
    def readBit(): Int = read(1)
    def eof: Boolean = (pos >>> 3) >= b.length
  }

  private def ilog(x0: Int): Int = {
    var x = x0; var r = 0
    while (x > 0) { r += 1; x >>>= 1 }
    r
  }

  /** Vorbis' own 32-bit float pack: 21-bit mantissa, 10-bit biased
    * exponent, sign (spec 9.2.2). */
  private def float32Unpack(x: Long): Float = {
    val mantissa = (x & 0x1fffff).toDouble
    val sign = (x & 0x80000000L) != 0
    val exp = ((x & 0x7fe00000L) >>> 21).toInt
    val v = mantissa * math.pow(2.0, exp - 788)
    val f = (if (sign) -v else v).toFloat
    // a packed exponent near the field's top overflows Float to ±Inf;
    // one Inf in a VQ table turns Inf-Inf = NaN in the iMDCT sums, and
    // NaN passes straight through min/max clamps — so a NaN mean would
    // ESCAPE the degrade-to-null contract. No valid stream encodes
    // non-finite VQ parameters: refuse at the source.
    require(java.lang.Float.isFinite(f), "non-finite packed float")
    f
  }

  // ---- codebooks ----------------------------------------------------------

  private final class Codebook(val dim: Int, val entries: Int,
                               lengths: Array[Int],
                               val lookupType: Int,
                               vq: Array[Array[Float]]) {
    // binary decode tree over the spec's canonical codeword assignment;
    // nodes as flat arrays: child(node)(bit) = index, or -(entry+1) leaf
    private val child = {
      val codes = Codebook.assignCodewords(lengths)
      var nNodes = 1
      val z = scala.collection.mutable.ArrayBuffer(0)
      val o = scala.collection.mutable.ArrayBuffer(0)
      for (e <- lengths.indices if lengths(e) > 0) {
        var node = 0
        var j = lengths(e) - 1
        while (j >= 0) {
          val bit = (codes(e) >>> j) & 1
          val arr = if (bit == 0) z else o
          if (j == 0) {
            require(arr(node) == 0, "huffman collision")
            arr(node) = -(e + 1)
          } else {
            if (arr(node) == 0) {
              z += 0; o += 0; nNodes += 1
              arr(node) = nNodes - 1
            }
            node = arr(node)
            require(node > 0, "huffman under a leaf")
          }
          j -= 1
        }
      }
      (z.toArray, o.toArray)
    }

    def decodeScalar(br: BitReader): Int = {
      var node = 0
      while (true) {
        val n = if (br.readBit() == 0) child._1(node) else child._2(node)
        require(n != 0, "invalid codeword")
        if (n < 0) return -n - 1
        node = n
      }
      -1 // unreachable
    }

    /** VQ vector for one decoded entry (lookup type 1/2). */
    def decodeVQ(br: BitReader): Array[Float] = {
      require(lookupType != 0, "scalar codebook used in VQ context")
      vq(decodeScalar(br))
    }
  }

  private object Codebook {
    /** Spec 3.2.1 canonical assignment (the libvorbis marker walk):
      * entries in order each take the lowest available codeword of
      * their length. */
    def assignCodewords(lengths: Array[Int]): Array[Int] = {
      val codes = new Array[Int](lengths.length)
      val marker = new Array[Int](33)
      val used = lengths.count(_ > 0)
      // single-entry codebook special case: one entry, zero-bit codeword
      // is rejected here (the fixture and real encoders use >= 2)
      require(used >= 2, "degenerate codebook")
      for (i <- lengths.indices if lengths(i) > 0) {
        val len = lengths(i)
        var entry = marker(len)
        require(len >= 32 || (entry >>> len) == 0, "overspecified huffman")
        codes(i) = entry
        var j = len
        var continue = true
        while (j > 0 && continue) {
          if ((marker(j) & 1) != 0) {
            if (j == 1) marker(1) += 1
            else marker(j) = marker(j - 1) << 1
            continue = false
          } else { marker(j) += 1; j -= 1 }
        }
        var k = len + 1
        while (k <= 32) {
          if ((marker(k) >>> 1) == entry) {
            entry = marker(k)
            marker(k) = marker(k - 1) << 1
            k += 1
          } else k = 33
        }
      }
      codes
    }

    def parse(br: BitReader): Codebook = {
      require(br.read(24) == 0x564342, "bad codebook sync")
      val dim = br.read(16)
      val entries = br.read(24)
      // dim 0 would make the lookup-values search below spin forever
      // (x^0 == 1 <= entries always) — a malformed stream must throw,
      // never hang the decoding task
      require(dim > 0 && entries > 0, "degenerate codebook shape")
      // the header FIELDS allow entries up to 2^24 and dim up to 2^16,
      // but a ~50-byte packet can declare both (ordered lengths cost a
      // handful of bits) and the VQ table allocation below would then
      // OOM — and OutOfMemoryError is an Error, ESCAPING the
      // catch-Exception degrade path and killing the task. Real books
      // are a few thousand entries with single-digit dims; cap far
      // above that, far below harm.
      require(entries <= (1 << 18) && dim <= 32 &&
        entries.toLong * dim <= (1L << 22), "implausible codebook size")
      val lengths = new Array[Int](entries)
      val ordered = br.readBit() == 1
      if (!ordered) {
        val sparse = br.readBit() == 1
        var i = 0
        while (i < entries) {
          if (sparse) {
            if (br.readBit() == 1) lengths(i) = br.read(5) + 1
          } else lengths(i) = br.read(5) + 1
          i += 1
        }
      } else {
        var curLen = br.read(5) + 1
        var i = 0
        while (i < entries) {
          val num = br.read(ilog(entries - i))
          var j = 0
          while (j < num) { lengths(i + j) = curLen; j += 1 }
          i += num
          curLen += 1
          require(i <= entries, "ordered codebook overrun")
        }
      }
      val lookupType = br.read(4)
      val vq: Array[Array[Float]] = lookupType match {
        case 0 => null
        case 1 | 2 =>
          val minimum = float32Unpack(br.readLong(32))
          val delta = float32Unpack(br.readLong(32))
          val valueBits = br.read(4) + 1
          val sequenceP = br.readBit() == 1
          val lookupValues =
            if (lookupType == 2) entries * dim
            else { // greatest v with v^dim <= entries
              var v = 1
              while (math.pow(v + 1, dim) <= entries) v += 1
              v
            }
          val mult = Array.fill(lookupValues)(br.read(valueBits))
          Array.tabulate(entries) { e =>
            val out = new Array[Float](dim)
            var last = 0.0f
            var indexDivisor = 1
            var d = 0
            while (d < dim) {
              val off =
                if (lookupType == 1) (e / indexDivisor) % lookupValues
                else e * dim + d
              out(d) = mult(off) * delta + minimum + last
              if (sequenceP) last = out(d)
              if (lookupType == 1) indexDivisor *= lookupValues
              d += 1
            }
            out
          }
        case t => throw new IllegalArgumentException(s"lookup type $t")
      }
      new Codebook(dim, entries, lengths, lookupType, vq)
    }
  }

  // ---- headers ------------------------------------------------------------

  private final case class Ident(channels: Int, rate: Int,
                                 blocksize0: Int, blocksize1: Int)

  private def identHeader(p: Array[Byte]): Ident = {
    val br = new BitReader(p)
    require(br.read(8) == 1, "not an ident header")
    require(new String(p, 1, 6, "US-ASCII") == "vorbis", "not vorbis")
    br.read(8 * 6) // skip the magic we just checked
    require(br.readLong(32) == 0L, "vorbis version")
    val channels = br.read(8)
    val rate = br.readLong(32).toInt
    br.readLong(32); br.readLong(32); br.readLong(32) // bitrate hints
    val bs = br.read(8)
    val blocksize0 = 1 << (bs & 0xf)
    val blocksize1 = 1 << (bs >>> 4)
    require(br.readBit() == 1, "ident framing")
    require(channels > 0 && rate > 0, "bad ident")
    require(blocksize0 <= blocksize1, "blocksize order")
    // the spec's legal range; it also bounds the iMDCT trig tables a
    // malformed exponent could otherwise inflate
    require(blocksize0 >= 64 && blocksize1 <= 8192, "blocksize range")
    Ident(channels, rate, blocksize0, blocksize1)
  }

  private final case class Floor1(partitionClasses: Array[Int],
                                  classDims: Array[Int],
                                  classSubclasses: Array[Int],
                                  classMasterbooks: Array[Int],
                                  subclassBooks: Array[Array[Int]],
                                  multiplier: Int,
                                  xList: Array[Int])

  private final case class Residue(tpe: Int, begin: Int, end: Int,
                                   partitionSize: Int,
                                   classifications: Int, classbook: Int,
                                   cascade: Array[Int],
                                   books: Array[Array[Int]])

  private final case class Mapping(submaps: Int,
                                   couplingMag: Array[Int],
                                   couplingAng: Array[Int],
                                   mux: Array[Int],
                                   submapFloor: Array[Int],
                                   submapResidue: Array[Int])

  private final case class Mode(blockflag: Int, mapping: Int)

  private final case class Setup(books: Array[Codebook],
                                 floors: Array[Floor1],
                                 residues: Array[Residue],
                                 mappings: Array[Mapping],
                                 modes: Array[Mode])

  private def setupHeader(p: Array[Byte], id: Ident): Setup = {
    val br = new BitReader(p)
    require(br.read(8) == 5, "not a setup header")
    require(new String(p, 1, 6, "US-ASCII") == "vorbis", "not vorbis")
    br.read(8 * 6)
    val books = Array.fill(br.read(8) + 1)(Codebook.parse(br))
    // time transforms: placeholders, must read 0
    val timeCount = br.read(6) + 1
    for (_ <- 0 until timeCount)
      require(br.read(16) == 0, "time transform")
    val floors = Array.fill(br.read(6) + 1) {
      val tpe = br.read(16)
      require(tpe == 1, s"floor type $tpe unsupported (LSP floor 0)")
      val partitions = br.read(5)
      val partitionClasses = Array.fill(partitions)(br.read(4))
      val maxClass = if (partitions == 0) -1 else partitionClasses.max
      val classDims = new Array[Int](maxClass + 1)
      val classSub = new Array[Int](maxClass + 1)
      val classMaster = Array.fill(maxClass + 1)(-1)
      val subBooks = new Array[Array[Int]](maxClass + 1)
      for (c <- 0 to maxClass) {
        classDims(c) = br.read(3) + 1
        classSub(c) = br.read(2)
        if (classSub(c) > 0) classMaster(c) = br.read(8)
        subBooks(c) = Array.fill(1 << classSub(c))(br.read(8) - 1)
      }
      val multiplier = br.read(2) + 1
      val rangebits = br.read(4)
      val x = Array.newBuilder[Int]
      x += 0
      x += (1 << rangebits)
      for (pi <- 0 until partitions; _ <- 0 until
          classDims(partitionClasses(pi)))
        x += br.read(rangebits)
      Floor1(partitionClasses, classDims, classSub, classMaster, subBooks,
        multiplier, x.result())
    }
    val residues = Array.fill(br.read(6) + 1) {
      val tpe = br.read(16)
      require(tpe <= 2, s"residue type $tpe unknown")
      val begin = br.read(24)
      val end = br.read(24)
      val psize = br.read(24) + 1
      val classifications = br.read(6) + 1
      val classbook = br.read(8)
      val cascade = Array.fill(classifications) {
        val low = br.read(3)
        if (br.readBit() == 1) low | (br.read(5) << 3) else low
      }
      val rBooks = cascade.map { c =>
        Array.tabulate(8)(b => if ((c & (1 << b)) != 0) br.read(8) else -1)
      }
      Residue(tpe, begin, end, psize, classifications, classbook,
        cascade, rBooks)
    }
    val mappings = Array.fill(br.read(6) + 1) {
      require(br.read(16) == 0, "mapping type")
      val submaps = if (br.readBit() == 1) br.read(4) + 1 else 1
      val (mag, ang) =
        if (br.readBit() == 1) {
          val steps = br.read(8) + 1
          val m = new Array[Int](steps)
          val a = new Array[Int](steps)
          for (s <- 0 until steps) {
            m(s) = br.read(ilog(id.channels - 1))
            a(s) = br.read(ilog(id.channels - 1))
            require(m(s) != a(s) && m(s) < id.channels &&
              a(s) < id.channels, "bad coupling")
          }
          (m, a)
        } else (Array.empty[Int], Array.empty[Int])
      require(br.read(2) == 0, "mapping reserved")
      val mux =
        if (submaps > 1) Array.fill(id.channels)(br.read(4))
        else new Array[Int](id.channels)
      val sf = new Array[Int](submaps)
      val sr = new Array[Int](submaps)
      for (s <- 0 until submaps) {
        br.read(8) // unused time config
        sf(s) = br.read(8)
        sr(s) = br.read(8)
      }
      Mapping(submaps, mag, ang, mux, sf, sr)
    }
    val modes = Array.fill(br.read(6) + 1) {
      val blockflag = br.readBit()
      require(br.read(16) == 0, "window type")
      require(br.read(16) == 0, "transform type")
      Mode(blockflag, br.read(8))
    }
    require(br.readBit() == 1, "setup framing")
    Setup(books, floors, residues, mappings, modes)
  }

  // ---- floor 1 decode + curve synthesis (spec 7.2.3 / 7.2.4) --------------

  private val inverseDbTable: Array[Float] = Array.tabulate(256) { x =>
    // exactly 35/64 dB per step, 1.0 at x = 255 (the spec's table)
    math.pow(10.0, -(255 - x) * (35.0 / 64.0) / 20.0).toFloat
  }

  /** Decoded Y vector, or null when the channel is unvoiced this frame
    * ("do not decode" for its residue). */
  private def floorDecode(br: BitReader, f: Floor1,
                          books: Array[Codebook]): Array[Int] = {
    if (br.readBit() == 0) return null
    val range = Array(256, 128, 86, 64)(f.multiplier - 1)
    val posts = f.xList.length
    val y = new Array[Int](posts)
    y(0) = br.read(ilog(range - 1))
    y(1) = br.read(ilog(range - 1))
    var offset = 2
    for (pi <- f.partitionClasses.indices) {
      val cls = f.partitionClasses(pi)
      val cdim = f.classDims(cls)
      val cbits = f.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) cval = books(f.classMasterbooks(cls)).decodeScalar(br)
      var j = 0
      while (j < cdim) {
        val book = f.subclassBooks(cls)(cval & csub)
        cval >>>= cbits
        y(offset + j) = if (book >= 0) books(book).decodeScalar(br) else 0
        j += 1
      }
      offset += cdim
    }
    y
  }

  private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  /** Floor curve over n2 = blocksize/2 LINEAR-amplitude bins. */
  private def floorCurve(f: Floor1, y: Array[Int], n2: Int): Array[Float] = {
    val range = Array(256, 128, 86, 64)(f.multiplier - 1)
    val posts = f.xList.length
    val finalY = new Array[Int](posts)
    val step2 = new Array[Boolean](posts)
    step2(0) = true; step2(1) = true
    finalY(0) = y(0); finalY(1) = y(1)
    for (i <- 2 until posts) {
      // low/high neighbors among PRIOR posts (x-list order)
      var lo = 0; var hi = 1
      for (j <- 0 until i) {
        if (f.xList(j) < f.xList(i) && f.xList(j) >= f.xList(lo)) lo = j
        if (f.xList(j) > f.xList(i) && f.xList(j) <= f.xList(hi)) hi = j
      }
      val predicted = renderPoint(f.xList(lo), finalY(lo),
        f.xList(hi), finalY(hi), f.xList(i))
      val v = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = 2 * math.min(highroom, lowroom)
      if (v != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        finalY(i) =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + predicted
            else predicted - (v - highroom) - 1
          } else if ((v & 1) == 1) predicted - ((v + 1) / 2)
          else predicted + v / 2
      } else { step2(i) = false; finalY(i) = predicted }
    }
    // render: sorted by x, lines between step2 posts
    val order = f.xList.indices.sortBy(f.xList(_))
    val curve = new Array[Float](n2)
    var hx = 0; var hy = 0
    var lx = 0
    var ly = math.min(finalY(order.head), range - 1) * f.multiplier
    for (i <- order if step2(i)) {
      hy = math.min(math.max(finalY(i), 0), range - 1) * f.multiplier
      hx = f.xList(i)
      if (hx > lx) renderLine(lx, ly, hx, hy, curve)
      else if (hx == 0) curve(0) = inverseDbTable(hy)
      lx = hx; ly = hy
    }
    if (hx < n2) { // fill beyond the last post
      var j = math.max(hx, 0)
      val v = inverseDbTable(ly)
      while (j < n2) { curve(j) = v; j += 1 }
    }
    curve
  }

  /** Spec render_line: integer Bresenham through the inverse-dB table. */
  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int,
                         v: Array[Float]): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    var x = x0
    var y = y0
    var err = 0
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x0 < v.length) v(x0) = inverseDbTable(math.min(math.max(y, 0), 255))
    x = x0 + 1
    while (x < x1) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      if (x < v.length) v(x) = inverseDbTable(math.min(math.max(y, 0), 255))
      x += 1
    }
  }

  // ---- residue decode (spec 8.6.2) ----------------------------------------

  /** Decode one residue configuration into `vectors` (one per channel
    * in this submap; `doNotDecode` flags channels whose floor was
    * unvoiced). Residue 2 treats the channel set as ONE interleaved
    * vector and deinterleaves at the end; types 0/1 run the walk over
    * the submap's decodable channels TOGETHER — the spec interleaves
    * classwords and partition payloads across channels within each
    * pass, so a per-channel sequential read would misalign every bit
    * after the first channel's first partition.
    */
  private def residueDecode(br: BitReader, r: Residue,
                            books: Array[Codebook],
                            vectors: Array[Array[Float]],
                            doNotDecode: Array[Boolean]): Unit = {
    val n2 = vectors(0).length
    if (r.tpe == 2) {
      if (doNotDecode.forall(identity)) return
      val inter = new Array[Float](vectors.length * n2)
      residueWalk(br, r, books, Array(inter))
      var i = 0
      while (i < inter.length) {
        vectors(i % vectors.length)(i / vectors.length) = inter(i)
        i += 1
      }
    } else {
      val vecs = vectors.indices.filter(!doNotDecode(_))
        .map(vectors(_)).toArray
      if (vecs.nonEmpty) residueWalk(br, r, books, vecs)
    }
  }

  /** The spec 8.6.2 partition walk over a set of channel vectors:
    * per pass, per partition GROUP — classwords for every channel
    * first (pass 0), then each partition's payloads channel by
    * channel. Types 0 and 1 differ only in how a VQ vector's entries
    * land inside the partition — type 0 interleaves with stride
    * psize/dim, type 1 writes sequentially (residue 2's interleaved
    * vector also walks as type 1).
    */
  private def residueWalk(br: BitReader, r: Residue,
                          books: Array[Codebook],
                          vecs: Array[Array[Float]]): Unit = {
    val classbook = books(r.classbook)
    val begin = math.min(r.begin, vecs(0).length)
    val end = math.min(r.end, vecs(0).length)
    val partitions = (end - begin) / r.partitionSize
    if (partitions <= 0) return
    val classes = Array.ofDim[Int](vecs.length, partitions)
    var pass = 0
    while (pass < 8) {
      var pc = 0
      while (pc < partitions) {
        if (pass == 0) {
          var j = 0
          while (j < vecs.length) {
            var temp = classbook.decodeScalar(br)
            var i = classbook.dim - 1
            while (i >= 0) {
              if (pc + i < partitions)
                classes(j)(pc + i) = temp % r.classifications
              temp /= r.classifications
              i -= 1
            }
            j += 1
          }
        }
        var i = 0
        while (i < classbook.dim && pc < partitions) {
          var j = 0
          while (j < vecs.length) {
            val book = r.books(classes(j)(pc))(pass)
            if (book >= 0) {
              val cb = books(book)
              val v = vecs(j)
              val base = begin + pc * r.partitionSize
              val steps = r.partitionSize / cb.dim
              var k = 0
              while (k < steps) {
                val vec = cb.decodeVQ(br)
                var d = 0
                while (d < cb.dim) {
                  // spec 8.6.4: type 0 interleaves entry d of step k at
                  // stride `steps`; types 1/2 write sequentially
                  val off = if (r.tpe == 0) d * steps + k else k * cb.dim + d
                  v(base + off) += vec(d)
                  d += 1
                }
                k += 1
              }
            }
            j += 1
          }
          pc += 1
          i += 1
        }
      }
      pass += 1
    }
  }

  // ---- windows, iMDCT, overlap-add ----------------------------------------

  /** Vorbis window slope value: sin(π/2 · sin²(π/2 · (i+0.5)/n)). */
  private def slope(i: Int, n: Int): Float =
    math.sin(math.Pi / 2 *
      math.pow(math.sin(math.Pi / 2 * (i + 0.5) / n), 2)).toFloat

  /** Full window for a block of size n whose left/right overlap slopes
    * span leftN/rightN samples (centered at n/4 and 3n/4 — the general
    * unequal-blocksize shape, spec 4.3.1).
    */
  private def window(n: Int, leftN: Int, rightN: Int): Array[Float] = {
    val w = new Array[Float](n)
    val leftStart = n / 4 - leftN / 2
    val rightStart = 3 * n / 4 - rightN / 2
    var i = 0
    while (i < n) {
      w(i) =
        if (i < leftStart) 0.0f
        else if (i < leftStart + leftN) slope(i - leftStart, leftN)
        else if (i < rightStart) 1.0f
        else if (i < rightStart + rightN)
          slope(rightN - 1 - (i - rightStart), rightN)
        else 0.0f
      i += 1
    }
    w
  }

  /** Direct-form inverse MDCT (spec 4.3.6): n time samples from n/2
    * spectral bins. O(n²) — kept as the readable spec transcription and
    * the cross-check oracle for [[imdct]]; the hot path runs the FFT
    * factorization below. */
  private[operators] def imdctDirect(spec: Array[Float]): Array[Float] = {
    val n2 = spec.length
    val n = 2 * n2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      var acc = 0.0
      var k = 0
      while (k < n2) {
        acc += spec(k) * math.cos(
          math.Pi / (2.0 * n) * (2 * i + 1 + n2) * (2 * k + 1))
        k += 1
      }
      out(i) = acc.toFloat
      i += 1
    }
    out
  }

  /** Per-blocksize trig tables for the FFT-based iMDCT. A stream uses at
    * most two block sizes (64..8192, powers of two by identHeader), so
    * the cache stays tiny; entries are immutable and shared across
    * executor task threads.
    *
    *   preRe/preIm  — e^{iπ(1+n2)(2k+1)/(2n)},  k < n2   (input rotation)
    *   postRe/postIm — e^{iπ i/n},               i < n    (output rotation)
    *   twRe/twIm    — e^{+2πi k/n},              k < n/2  (FFT butterflies)
    */
  private final class ImdctTables(val n2: Int) {
    val n: Int = 2 * n2
    val preRe = new Array[Double](n2); val preIm = new Array[Double](n2)
    val postRe = new Array[Double](n); val postIm = new Array[Double](n)
    val twRe = new Array[Double](n / 2)
    val twIm = new Array[Double](n / 2)
    locally { var k = 0
      while (k < n2) {
        val phi = math.Pi * (1.0 + n2) * (2 * k + 1) / (2.0 * n)
        preRe(k) = math.cos(phi); preIm(k) = math.sin(phi); k += 1
      }
      var i = 0
      while (i < n) {
        val a = math.Pi * i / n
        postRe(i) = math.cos(a); postIm(i) = math.sin(a); i += 1
      }
      var t = 0
      while (t < n / 2) {
        val a = 2.0 * math.Pi * t / n
        twRe(t) = math.cos(a); twIm(t) = math.sin(a); t += 1
      }
    }
  }
  private val imdctTables =
    new java.util.concurrent.ConcurrentHashMap[Int, ImdctTables]()

  /** Un-normalized radix-2 DIT transform with the e^{+2πi/n} kernel
    * (i.e. an inverse DFT without the 1/n factor), in place. */
  private def fftInPlace(re: Array[Double], im: Array[Double],
                         twRe: Array[Double], twIm: Array[Double]): Unit = {
    val n = re.length
    var j = 0
    var i = 1
    while (i < n) { // bit-reversal permutation
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        var t = re(i); re(i) = re(j); re(j) = t
        t = im(i); im(i) = im(j); im(j) = t
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val half = len >> 1
      val step = n / len // table stride: e^{+2πi k/len} = tw(k·n/len)
      var base = 0
      while (base < n) {
        var k = 0
        var tw = 0
        while (k < half) {
          val wr = twRe(tw); val wi = twIm(tw)
          val a = base + k; val b = a + half
          val xr = re(b) * wr - im(b) * wi
          val xi = re(b) * wi + im(b) * wr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          k += 1; tw += step
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Inverse MDCT via one length-n complex FFT — O(n log n).
    *
    * Factorization of the spec 4.3.6 sum: with N = 2·n2,
    *   y(i) = Σₖ X(k)·cos(π/(2N)·(2i+1+N/2)(2k+1))
    * and (2i+1+N/2)(2k+1) = 2i(2k+1) + (1+N/2)(2k+1), so
    *   y(i) = Re[ e^{iπi/N} · Σₖ (X(k)·e^{iφₖ}) · e^{2πi·ik/N} ],
    *   φₖ = π(1+N/2)(2k+1)/(2N)
    * — an input rotation, an un-normalized inverse DFT of the rotated
    * spectrum zero-padded to N, and an output rotation. Double-precision
    * throughout (matches imdctDirect's accumulator); the analytic
    * fixtures and the randomized cross-check spec pin agreement. */
  private[operators] def imdct(spec: Array[Float]): Array[Float] = {
    val n2 = spec.length
    val t = imdctTables.computeIfAbsent(n2, m => new ImdctTables(m))
    val n = t.n
    val re = new Array[Double](n); val im = new Array[Double](n)
    var k = 0
    while (k < n2) {
      re(k) = spec(k) * t.preRe(k)
      im(k) = spec(k) * t.preIm(k)
      k += 1
    }
    fftInPlace(re, im, t.twRe, t.twIm)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = (re(i) * t.postRe(i) - im(i) * t.postIm(i)).toFloat
      i += 1
    }
    out
  }

  // ---- per-packet synthesis ----------------------------------------------

  private final class Synthesizer(id: Ident, setup: Setup) {
    // previous block's windowed right half per channel + its block size
    private var prevRight: Array[Array[Float]] = null
    private var prevN = 0

    /** Interleaved PCM float samples this packet CONTRIBUTES (empty for
      * the first packet, which only primes the overlap buffer). */
    def decodePacket(p: Array[Byte]): Array[Float] = {
      val br = new BitReader(p)
      require(br.readBit() == 0, "not an audio packet")
      val mode = setup.modes(br.read(ilog(setup.modes.length - 1)))
      val n = if (mode.blockflag == 1) id.blocksize1 else id.blocksize0
      // long blocks carry neighbor-size hints that pick the slope widths
      val (prevFlag, nextFlag) =
        if (mode.blockflag == 1) (br.readBit() == 1, br.readBit() == 1)
        else (true, true)
      val leftN = if (prevFlag) n / 2 else id.blocksize0 / 2
      val rightN = if (nextFlag) n / 2 else id.blocksize0 / 2
      val mapping = setup.mappings(mode.mapping)
      val n2 = n / 2

      // floors + residues: an END-OF-PACKET from here on is NORMAL
      // (truncated final packet, or an encoder relying on the spec's
      // EOP termination) — keep what was decoded, the rest stays zero/
      // unvoiced. EOP in the header bits above still fails the stream.
      val floorOut = new Array[Array[Float]](id.channels)
      val unvoiced = new Array[Boolean](id.channels)
      val residueOut = Array.fill(id.channels)(new Array[Float](n2))
      try {
        for (c <- 0 until id.channels) {
          val f = setup.floors(mapping.submapFloor(mapping.mux(c)))
          val y = floorDecode(br, f, setup.books)
          if (y == null) unvoiced(c) = true
          else floorOut(c) = floorCurve(f, y, n2)
        }
        // coupling: an unvoiced magnitude/angle partner revives the other
        for (s <- mapping.couplingMag.indices) {
          if (!unvoiced(mapping.couplingMag(s)) ||
              !unvoiced(mapping.couplingAng(s))) {
            unvoiced(mapping.couplingMag(s)) = false
            unvoiced(mapping.couplingAng(s)) = false
          }
        }
        // residues per submap
        for (s <- 0 until mapping.submaps) {
          val chans = (0 until id.channels).filter(mapping.mux(_) == s)
          val r = setup.residues(mapping.submapResidue(s))
          val vecs = chans.map(residueOut(_)).toArray
          val dnd = chans.map(unvoiced(_)).toArray
          residueDecode(br, r, setup.books, vecs, dnd)
        }
      } catch { case _: EopException => () }
      // inverse coupling (square polar, spec 4.3.5), last step first
      for (s <- mapping.couplingMag.indices.reverse) {
        val m = residueOut(mapping.couplingMag(s))
        val a = residueOut(mapping.couplingAng(s))
        var i = 0
        while (i < n2) {
          val (nm, na) =
            if (m(i) > 0) { if (a(i) > 0) (m(i), m(i) - a(i)) else (m(i) + a(i), m(i)) }
            else { if (a(i) > 0) (m(i), m(i) + a(i)) else (m(i) - a(i), m(i)) }
          m(i) = nm; a(i) = na
          i += 1
        }
      }
      // dot product + iMDCT + window
      val w = window(n, leftN, rightN)
      val windowed = Array.tabulate(id.channels) { c =>
        val spec = new Array[Float](n2)
        if (!unvoiced(c) && floorOut(c) != null) {
          var i = 0
          while (i < n2) {
            spec(i) = residueOut(c)(i) * floorOut(c)(i)
            i += 1
          }
        }
        val t = imdct(spec)
        var i = 0
        while (i < n) { t(i) *= w(i); i += 1 }
        t
      }
      // overlap-add (general, center-aligned): this packet returns
      // prevN/4 + n/4 samples spanning [prev center, cur center)
      val out: Array[Float] =
        if (prevRight == null) Array.empty
        else {
          val count = prevN / 4 + n / 4
          val o = new Array[Float](count * id.channels)
          // cur block's absolute start relative to prev block start:
          // right-slope center of prev (3·prevN/4) = left-slope center
          // of cur (curN/4)
          val curT0 = 3 * prevN / 4 - n / 4
          var j = 0
          while (j < count) {
            val t = prevN / 2 + j
            var c = 0
            while (c < id.channels) {
              var v = 0.0f
              if (t < prevN) v += prevRight(c)(t - prevN / 2)
              val ci = t - curT0
              if (ci >= 0 && ci < n) v += windowed(c)(ci)
              o(j * id.channels + c) = v
              c += 1
            }
            j += 1
          }
          o
        }
      prevRight = windowed.map(_.slice(n / 2, n))
      prevN = n
      out
    }
  }
}
