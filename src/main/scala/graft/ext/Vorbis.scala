package graft.ext

/** Vorbis I decoder + fixture encoder, implemented from the public
  * Vorbis I specification (Xiph.Org Foundation) — no codec library.
  * The r12 verdict's item 4 decided DECODE (not hold): unlike MP3
  * (whose Huffman tables are non-derivable spec data, forcing the
  * documented embedded-subset boundary in [[Mp3]]), Vorbis is fully
  * SELF-DESCRIBING — codebooks, floor curves, residue configuration
  * and channel-coupling topology all travel in the stream's own setup
  * header, so a from-spec implementation needs no substituted tables
  * and can decode WILD files in principle, not just fixture streams.
  *
  * Decoder surface: Ogg page walk (CRC-checked, lacing reassembly,
  * continued packets), LSB-first bit unpack, codebook parse with
  * canonical first-fit Huffman assignment (Kraft-validated: over- or
  * under-specified trees refuse the stream), both scalar and VQ
  * (lookup types 1 and 2) contexts, BOTH floor types — floor 1 (the
  * modern floor: class/subclass books, low/high-neighbor prediction,
  * integer render_line) and floor 0 (the legacy LSP envelope: VQ
  * coefficient decode, bark-warped frequency map, the closed-form
  * line-spectral-pair curve of spec 6.2.3, pinned in VorbisSpec
  * against a direct complex polynomial evaluation) — residue types
  * 0, 1 and 2 (cascaded passes, partition classification words),
  * square-polar channel-coupling inverse, IMDCT via a zero-padded
  * FFT evaluation of the odd-frequency DCT kernel (validated
  * bit-for-bit against the direct O(n^2) spec definition in
  * VorbisSpec), Vorbis windows with long/short slope matching,
  * center-aligned overlap-add, and final-granule truncation.
  *
  * Documented boundaries (census-visible, the [[Mp3]] discipline):
  * mapping types != 0 and any header the validators reject. DECISION
  * RECORD (r15): mapping type is a 16-bit field the Vorbis I spec
  * (4.2.4) defines only for value 0 — every other value is RESERVED,
  * never assigned in any spec revision, and a compliant decoder MUST
  * reject it as undecodable. Refusal here is therefore the spec's
  * own prescribed behavior, not a closable implementation gap; there
  * is nothing to implement without inventing semantics. CLOSED as
  * spec-complete. One spec
  * TABLE is derived rather than transcribed: `floor1_inverse_dB_table
  * [i]` is exactly `10^((i-255)*7/256)` — the published table spans
  * 1.0649863e-07 to 1.0 in a uniform 140/256 dB step, so the closed
  * form is unambiguous (the spec's float32 digits are roundings of
  * it). Honest caveat of the same kind as [[Mp3]]'s substitution #3:
  * floor0's bark() warp constants (13.1/0.00074, 2.24/1.85e-8,
  * 0.0001 — spec 6.2.3) are transcribed numerics validated only
  * structurally (monotone map, DC at zero, clamped top); the LSP
  * curve itself is a mathematical identity and IS independently
  * pinned.
  *
  * The fixture encoder (the [[Flac]]/[[Mp3]]/[[Vp8l]] discipline:
  * real bitstreams, deterministic, no library) emits spec-valid
  * streams with self-made codebooks — a two-point floor-1 line
  * (partitions=0) OR a floor-0 LSP envelope (bark-warped LPC via
  * Levinson-Durbin, Chebyshev root isolation, coefficients through a
  * real dim-1 VQ delta book, error-minimizing amplitude search),
  * residue type 2 with a two-pass coarse+fine cascade over 15x15
  * explicit-lookup lattice books, mono or stereo, long or short
  * blocks — which the decoder consumes through the exact code paths
  * wild files take.
  */
object Vorbis {

  // ------------------------------------------------------------------
  // Ogg encapsulation
  // ------------------------------------------------------------------

  /** CRC-32 with polynomial 0x04c11db7, no reflection, zero init and
    * xorout — Ogg's page checksum (RFC 3533 section 6).
    */
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private[ext] def oggCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ (b(off + i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  /** True when the payload is an Ogg stream whose first BOS packet is
    * a Vorbis identification header.
    */
  def isOggVorbis(b: Array[Byte]): Boolean =
    b != null && b.length >= 58 && b(0) == 'O' && b(1) == 'g' &&
      b(2) == 'g' && b(3) == 'S' && {
        val nSegs = b(26) & 0xff
        val po = 27 + nSegs
        po + 7 <= b.length && b(po) == 1 && b(po + 1) == 'v' &&
          b(po + 2) == 'o' && b(po + 3) == 'r' && b(po + 4) == 'b' &&
          b(po + 5) == 'i' && b(po + 6) == 's'
      }

  /** Reassemble the packets of the FIRST logical stream whose BOS
    * payload satisfies `bosMatch`: (packets in order, final granule
    * position of that stream, or -1 if none seen). CRC-checked per
    * page; a corrupt page stops the walk (packets so far are
    * returned — truncation degrades, the codec-family rule). Shared
    * by the Vorbis decode and the Ogg-FLAC mapping.
    */
  private[ext] def oggPackets(b: Array[Byte],
      bosMatch: (Array[Byte], Int, Int) => Boolean)
      : Option[(Vector[Array[Byte]], Long)] = {
    var serial = 0L
    var haveSerial = false
    var finalGranule = -1L
    val packets = Vector.newBuilder[Array[Byte]]
    var nPackets = 0
    val pending = new java.io.ByteArrayOutputStream()
    var pendingOpen = false // a packet is mid-assembly (lace 255 tail)
    var off = 0
    var walking = true
    while (walking && off + 27 <= b.length && b(off) == 'O' &&
        b(off + 1) == 'g' && b(off + 2) == 'g' && b(off + 3) == 'S') {
      val flags = b(off + 5) & 0xff
      val granule = u32le(b, off + 6) | (u32le(b, off + 10) << 32)
      val pageSerial = u32le(b, off + 14)
      val nSegs = b(off + 26) & 0xff
      if (off + 27 + nSegs > b.length) walking = false
      else {
        var paySize = 0
        var s = 0
        while (s < nSegs) { paySize += b(off + 27 + s) & 0xff; s += 1 }
        val payOff = off + 27 + nSegs
        val pageLen = 27 + nSegs + paySize
        if (payOff + paySize > b.length) walking = false
        else {
          // CRC over the page with the checksum field zeroed
          val stored = u32le(b, off + 22).toInt
          val page = java.util.Arrays.copyOfRange(b, off, off + pageLen)
          page(22) = 0; page(23) = 0; page(24) = 0; page(25) = 0
          if (oggCrc(page, 0, pageLen) != stored) walking = false
          else {
            if (!haveSerial && (flags & 2) != 0 && nSegs >= 1 &&
                bosMatch(b, payOff, paySize)) {
              serial = pageSerial
              haveSerial = true
            }
            if (haveSerial && pageSerial == serial) {
              if ((flags & 1) == 0 && pendingOpen) {
                // expected a continuation and did not get one: the
                // unfinished packet is lost (a "hole"); drop it
                pending.reset(); pendingOpen = false
              }
              var so = payOff
              var seg = 0
              while (seg < nSegs) {
                val lace = b(off + 27 + seg) & 0xff
                pending.write(b, so, lace)
                so += lace
                if (lace < 255) {
                  packets += pending.toByteArray
                  nPackets += 1
                  if (nPackets > MaxPackets) return None
                  pending.reset()
                  pendingOpen = false
                } else pendingOpen = true
                seg += 1
              }
              if (granule >= 0) finalGranule = granule
              if ((flags & 4) != 0) walking = false // EOS
            }
            off += pageLen
          }
        }
      }
    }
    val ps = packets.result()
    if (ps.isEmpty) None else Some((ps, finalGranule))
  }

  private val MaxPackets = 1 << 20 // fuzz backstop: ~3h of audio

  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  // ------------------------------------------------------------------
  // LSB-first bit unpack (Vorbis I spec section 2)
  // ------------------------------------------------------------------

  /** Thrown (privately) on reads past the packet end; decode paths
    * catch it at the packet/stream boundary. The spec's own rule:
    * "end of packet" mid-decode is not an error for audio packets
    * (the frame is abandoned) but IS for headers.
    */
  private final class EndOfPacket extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class BitReader(b: Array[Byte]) {
    private var bytePos = 0
    private var bitPos = 0
    def read(n: Int): Int = {
      var v = 0
      var got = 0
      while (got < n) {
        if (bytePos >= b.length) throw new EndOfPacket
        val avail = 8 - bitPos
        val take = math.min(avail, n - got)
        val bits = ((b(bytePos) & 0xff) >>> bitPos) & ((1 << take) - 1)
        v |= bits << got
        got += take
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      }
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var got = 0
      while (got < n) {
        val take = math.min(24, n - got)
        v |= read(take).toLong << got
        got += take
      }
      v
    }
    def readBit(): Int = read(1)
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= (((v >>> i) & 1L).toInt) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    /** Huffman codeword: path bits root-first (bit len-1 of `code` is
      * the root branch), each written as one stream bit.
      */
    def writeCode(code: Long, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { write((code >>> k) & 1L, 1); k -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** ilog per spec section 9.2.1: position of the highest set bit,
    * ilog(0) = 0, ilog(1) = 1, ilog(7) = 3.
    */
  private[ext] def ilog(x: Int): Int = {
    var v = x
    var r = 0
    while (v > 0) { r += 1; v >>>= 1 }
    r
  }

  /** float32_unpack per spec 9.2.2: 21-bit mantissa, sign bit 21
    * above it, 10-bit exponent biased 768 against a 20-bit mantissa
    * point (so the effective scale is 2^(exp - 788)).
    */
  private[ext] def float32Unpack(x: Long): Double = {
    val mantissa = (x & 0x1fffff).toDouble
    val exponent = ((x & 0x7fe00000L) >>> 21).toInt
    val v = mantissa * math.pow(2.0, exponent - 788)
    if ((x & 0x80000000L) != 0) -v else v
  }

  /** The encoder-side inverse, exact for the small dyadic rationals
    * the fixture books use.
    */
  private[ext] def float32Pack(v: Double): Long = {
    if (v == 0.0) return 0L
    val sign = if (v < 0) 0x80000000L else 0L
    var m = math.abs(v)
    var e = 788
    while (m < (1 << 20) && e > 0) { m *= 2; e -= 1 }
    while (m >= (1 << 21)) { m /= 2; e += 1 }
    sign | (e.toLong << 21) | math.round(m)
  }

  // ------------------------------------------------------------------
  // Codebooks (spec section 3)
  // ------------------------------------------------------------------

  private final class Codebook(
      val dim: Int,
      val entries: Int,
      val lengths: Array[Int], // 0 = unused entry
      val lookupType: Int,
      val minV: Double,
      val deltaV: Double,
      val sequenceP: Boolean,
      val mults: Array[Int],
      val lookupValues: Int) {

    // Binary decode tree, built by canonical first-fit assignment:
    // entries in order, each claiming the LEFTMOST free codeword of
    // its length (spec 3.2.1). Lengths arrive UNSORTED, so the
    // leftmost fit needs backtracking: a full-pruned DFS whose failed
    // branches only touch completed subtrees keeps it near-linear.
    private final class Node {
      var c0: Node = null
      var c1: Node = null
      var leaf = -1 // entry number, -1 = internal/empty
      var full = false
    }
    private val root = new Node

    val singleEntry: Int = {
      var e = -1
      var c = 0
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { c += 1; e = i }
        i += 1
      }
      if (c == 1) e else -1
    }

    /** Encoder-side codeword per entry (root branch at bit len-1). */
    val codes = new Array[Long](entries)

    /** Claim the leftmost free codeword of length `len` for `entry`;
      * -1 when none exists (overspecified book).
      */
    private def insert(entry: Int, len: Int): Long = {
      def ins(node: Node, d: Int): Long = {
        if (node.leaf >= 0 || node.full) return -1L
        if (d == 0) {
          if (node.c0 != null || node.c1 != null) return -1L
          node.leaf = entry
          node.full = true
          return 0L
        }
        val fresh0 = node.c0 == null
        if (fresh0) node.c0 = new Node
        val l = ins(node.c0, d - 1)
        if (l >= 0) {
          node.full = node.c0.full && node.c1 != null && node.c1.full
          return l // 0 branch: high bit stays 0
        }
        if (fresh0) node.c0 = null
        val fresh1 = node.c1 == null
        if (fresh1) node.c1 = new Node
        val r = ins(node.c1, d - 1)
        if (r >= 0) {
          node.full = node.c1.full && node.c0 != null && node.c0.full
          return (1L << (d - 1)) | r
        }
        if (fresh1) node.c1 = null
        -1L
      }
      ins(root, len)
    }

    /** Build the tree; false on an overspecified book. */
    def build(): Boolean = {
      if (singleEntry >= 0) return true
      var any = false
      var i = 0
      while (i < entries) {
        val l = lengths(i)
        if (l > 0) {
          any = true
          val c = insert(i, l)
          if (c < 0) return false
          codes(i) = c
        }
        i += 1
      }
      if (!any) return true // an unused book: legal until referenced
      root.full // underspecification check: the tree must be complete
    }

    def isComplete: Boolean = singleEntry >= 0 || root.full

    def decodeScalar(br: BitReader): Int = {
      // the one legal underpopulated tree: spec 3.2.1 — a codebook with
      // a single used entry "consists of a single codework of zero
      // bits", so decoding it SINKS NO BITS (pinned in VorbisSpec;
      // sinking the entry's declared length here would bit-desync every
      // following read in the packet)
      if (singleEntry >= 0) return singleEntry
      var node = root
      while (true) {
        node = if (br.readBit() == 0) node.c0 else node.c1
        if (node == null) throw new EndOfPacket // unreachable: full tree
        if (node.leaf >= 0) return node.leaf
      }
      -1
    }

    /** VQ vector for one codeword (lookup type 1 or 2, spec 3.3). */
    def decodeVq(br: BitReader, out: Array[Double], outOff: Int): Unit = {
      val entry = decodeScalar(br)
      var last = 0.0
      if (lookupType == 1) {
        var divisor = 1
        var i = 0
        while (i < dim) {
          val off = (entry / divisor) % lookupValues
          val v = mults(off) * deltaV + minV + last
          out(outOff + i) = v
          if (sequenceP) last = v
          divisor *= lookupValues
          i += 1
        }
      } else {
        var i = 0
        while (i < dim) {
          val v = mults(entry * dim + i) * deltaV + minV + last
          out(outOff + i) = v
          if (sequenceP) last = v
          i += 1
        }
      }
    }
  }

  private def parseCodebook(br: BitReader): Option[Codebook] = {
    if (br.read(24) != 0x564342) return None
    val dim = br.read(16)
    val entries = br.read(24)
    if (dim < 1 || entries < 1 || entries > (1 << 20)) return None
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
      var cur = 0
      while (cur < entries) {
        val num = br.read(ilog(entries - cur))
        if (cur + num > entries) return None
        var i = 0
        while (i < num) { lengths(cur + i) = curLen; i += 1 }
        cur += num
        curLen += 1
        if (curLen > 32) return None
      }
    }
    val lookupType = br.read(4)
    if (lookupType > 2) return None
    var minV = 0.0; var deltaV = 0.0
    var seqP = false
    var mults: Array[Int] = Array.emptyIntArray
    var lookupValues = 0
    if (lookupType > 0) {
      minV = float32Unpack(br.readLong(32))
      deltaV = float32Unpack(br.readLong(32))
      val valueBits = br.read(4) + 1
      seqP = br.readBit() == 1
      val lookupValuesL: Long =
        if (lookupType == 1) {
          // largest integer x with x^dim <= entries
          var x = 1L
          while (math.pow(x + 1, dim) <= entries + 0.5) x += 1
          x
        } else entries.toLong * dim // spec-legal up to 2^20 · 65535:
      // overflows Int, so the cap check MUST run in Long — a wrapped
      // product here would slip the guard and allocate garbage
      if (lookupValuesL > (1 << 22)) return None
      lookupValues = lookupValuesL.toInt
      mults = new Array[Int](lookupValues)
      var i = 0
      while (i < lookupValues) { mults(i) = br.read(valueBits); i += 1 }
    }
    val cb = new Codebook(dim, entries, lengths, lookupType, minV, deltaV,
      seqP, mults, lookupValues)
    if (!cb.build() || !cb.isComplete) None else Some(cb)
  }

  /** Test hook: parse one codebook at the head of `b`, then decode
    * `nScalars` scalar codewords and (optionally) one VQ vector from
    * the remaining bits — the ordered/sparse/lookup-1 parse paths the
    * fixture encoder never emits stay unit-testable without widening
    * the production surface.
    */
  private[ext] def testCodebook(b: Array[Byte], nScalars: Int,
      vq: Boolean = false): Option[(Seq[Int], Array[Double])] = try {
    val br = new BitReader(b)
    parseCodebook(br).map { cb =>
      val scalars = (0 until nScalars).map(_ => cb.decodeScalar(br))
      val vec =
        if (vq) {
          val out = new Array[Double](cb.dim)
          cb.decodeVq(br, out, 0)
          out
        } else Array.emptyDoubleArray
      (scalars, vec)
    }
  } catch { case _: EndOfPacket => None }

  // ------------------------------------------------------------------
  // Setup-header components (spec sections 6-8)
  // ------------------------------------------------------------------

  private[ext] sealed trait Floor

  /** Floor type 0 (spec section 6): the legacy LSP envelope. Entirely
    * formulaic — amplitude + LSP coefficients decode from in-band
    * codebooks and the curve is the closed-form line-spectral-pair
    * evaluation of spec 6.2.3 (no numeric tables), so wild floor0
    * streams decode by construction. `mapCache` memoizes the bark map
    * per half-block size (decode is single-threaded per stream).
    */
  private[ext] final case class Floor0(
      order: Int,
      rate: Int,
      barkMapSize: Int,
      ampBits: Int,
      ampOffset: Int,
      bookList: Array[Int]) extends Floor {
    val mapCache = scala.collection.mutable.HashMap.empty[Int, Array[Int]]
  }

  private final case class Floor1(
      partitions: Int,
      classList: Array[Int],
      classDims: Array[Int],
      classSubclasses: Array[Int],
      classMasterbooks: Array[Int],
      subclassBooks: Array[Array[Int]],
      multiplier: Int,
      xList: Array[Int],
      sortOrder: Array[Int]) // indices of xList in ascending-X order
      extends Floor

  private final case class Residue(
      resType: Int,
      begin: Int,
      end: Int,
      partitionSize: Int,
      classifications: Int,
      classbook: Int,
      cascade: Array[Int],
      books: Array[Array[Int]]) // [class][pass], -1 unused

  private final case class Mapping(
      submaps: Int,
      couplingMag: Array[Int],
      couplingAng: Array[Int],
      mux: Array[Int],
      submapFloor: Array[Int],
      submapResidue: Array[Int])

  private final case class Mode(
      blockflag: Int,
      mapping: Int)

  private final case class Setup(
      codebooks: Array[Codebook],
      floors: Array[Floor], // Floor0 (legacy LSP) or Floor1
      residues: Array[Residue],
      mappings: Array[Mapping],
      modes: Array[Mode])

  private def parseFloor1(br: BitReader, nBooks: Int,
      books: Array[Codebook]): Option[Floor1] = {
    val partitions = br.read(5)
    val classList = new Array[Int](partitions)
    var maxClass = -1
    var i = 0
    while (i < partitions) {
      classList(i) = br.read(4)
      if (classList(i) > maxClass) maxClass = classList(i)
      i += 1
    }
    val nClasses = maxClass + 1
    val classDims = new Array[Int](nClasses)
    val classSub = new Array[Int](nClasses)
    val masterbooks = Array.fill(nClasses)(-1)
    val subBooks = new Array[Array[Int]](nClasses)
    i = 0
    while (i < nClasses) {
      classDims(i) = br.read(3) + 1
      classSub(i) = br.read(2)
      if (classSub(i) > 0) {
        masterbooks(i) = br.read(8)
        if (masterbooks(i) >= nBooks) return None
      }
      val n = 1 << classSub(i)
      subBooks(i) = new Array[Int](n)
      var j = 0
      while (j < n) {
        subBooks(i)(j) = br.read(8) - 1
        if (subBooks(i)(j) >= nBooks) return None
        j += 1
      }
      i += 1
    }
    val multiplier = br.read(2) + 1
    val rangebits = br.read(4)
    val nValues = 2 + classList.map(classDims(_)).sum
    if (nValues > 65) return None
    val xList = new Array[Int](nValues)
    xList(0) = 0
    xList(1) = 1 << rangebits
    var pos = 2
    i = 0
    while (i < partitions) {
      val dim = classDims(classList(i))
      var j = 0
      while (j < dim) {
        xList(pos) = br.read(rangebits)
        pos += 1
        j += 1
      }
      i += 1
    }
    // non-unique X values are an error per spec 7.2.2
    if (xList.distinct.length != nValues) return None
    val order = xList.indices.sortBy(xList(_)).toArray
    Some(Floor1(partitions, classList, classDims, classSub, masterbooks,
      subBooks, multiplier, xList, order))
  }

  private def parseSetup(p: Array[Byte], channels: Int): Option[Setup] =
    try {
      val br = new BitReader(p)
      // packet type 5 + "vorbis"
      if (br.read(8) != 5) return None
      var i = 0
      while (i < 6) { br.read(8); i += 1 }
      val nBooks = br.read(8) + 1
      val books = new Array[Codebook](nBooks)
      i = 0
      while (i < nBooks) {
        books(i) = parseCodebook(br) match {
          case Some(cb) => cb
          case None     => return None
        }
        i += 1
      }
      val timeCount = br.read(6) + 1
      i = 0
      while (i < timeCount) {
        if (br.read(16) != 0) return None
        i += 1
      }
      val floorCount = br.read(6) + 1
      val floors = new Array[Floor](floorCount)
      i = 0
      while (i < floorCount) {
        val t = br.read(16)
        if (t == 1) {
          floors(i) = parseFloor1(br, nBooks, books) match {
            case Some(f) => f
            case None    => return None
          }
        } else if (t == 0) {
          // floor0 (legacy LSP, spec 6.2): zero order/rate/barkMapSize
          // make the curve synthesis degenerate — spec 6.2.2's header
          // validation refuses them; every listed book must carry a
          // value mapping (the coefficients decode "in VQ context")
          val order = br.read(8)
          val rate = br.read(16)
          val barkMapSize = br.read(16)
          val ampBits = br.read(6)
          val ampOffset = br.read(8)
          if (order < 1 || rate < 1 || barkMapSize < 1) return None
          val nb = br.read(4) + 1
          val bookList = new Array[Int](nb)
          var j = 0
          while (j < nb) {
            bookList(j) = br.read(8)
            if (bookList(j) >= nBooks ||
              books(bookList(j)).lookupType == 0) return None
            j += 1
          }
          floors(i) = Floor0(order, rate, barkMapSize, ampBits,
            ampOffset, bookList)
        } else return None
        i += 1
      }
      val residueCount = br.read(6) + 1
      val residues = new Array[Residue](residueCount)
      i = 0
      while (i < residueCount) {
        val t = br.read(16)
        if (t > 2) return None
        val begin = br.read(24)
        val end = br.read(24)
        val psize = br.read(24) + 1
        val classifications = br.read(6) + 1
        val classbook = br.read(8)
        if (begin > end || classbook >= nBooks) return None
        val cascade = new Array[Int](classifications)
        var j = 0
        while (j < classifications) {
          val low = br.read(3)
          val high = if (br.readBit() == 1) br.read(5) else 0
          cascade(j) = (high << 3) | low
          j += 1
        }
        val rbooks = Array.fill(classifications)(Array.fill(8)(-1))
        j = 0
        while (j < classifications) {
          var pass = 0
          while (pass < 8) {
            if ((cascade(j) & (1 << pass)) != 0) {
              val bk = br.read(8)
              // a residue value book must have a value mapping
              if (bk >= nBooks || books(bk).lookupType == 0) return None
              rbooks(j)(pass) = bk
            }
            pass += 1
          }
          j += 1
        }
        residues(i) = Residue(t, begin, end, psize, classifications,
          classbook, cascade, rbooks)
        i += 1
      }
      val mappingCount = br.read(6) + 1
      val mappings = new Array[Mapping](mappingCount)
      i = 0
      while (i < mappingCount) {
        if (br.read(16) != 0) return None
        val submaps = if (br.readBit() == 1) br.read(4) + 1 else 1
        var steps = 0
        var mags: Array[Int] = Array.emptyIntArray
        var angs: Array[Int] = Array.emptyIntArray
        if (br.readBit() == 1) {
          steps = br.read(8) + 1
          mags = new Array[Int](steps)
          angs = new Array[Int](steps)
          var j = 0
          while (j < steps) {
            mags(j) = br.read(ilog(channels - 1))
            angs(j) = br.read(ilog(channels - 1))
            if (mags(j) == angs(j) || mags(j) >= channels ||
              angs(j) >= channels) return None
            j += 1
          }
        }
        if (br.read(2) != 0) return None
        val mux = new Array[Int](channels)
        if (submaps > 1) {
          var j = 0
          while (j < channels) {
            mux(j) = br.read(4)
            if (mux(j) >= submaps) return None
            j += 1
          }
        }
        val sFloor = new Array[Int](submaps)
        val sRes = new Array[Int](submaps)
        var j = 0
        while (j < submaps) {
          br.read(8) // unused time configuration placeholder
          sFloor(j) = br.read(8)
          if (sFloor(j) >= floorCount) return None
          sRes(j) = br.read(8)
          if (sRes(j) >= residueCount) return None
          j += 1
        }
        mappings(i) = Mapping(submaps, mags, angs, mux, sFloor, sRes)
        i += 1
      }
      val modeCount = br.read(6) + 1
      val modes = new Array[Mode](modeCount)
      i = 0
      while (i < modeCount) {
        val blockflag = br.readBit()
        if (br.read(16) != 0) return None // window type
        if (br.read(16) != 0) return None // transform type
        val mapping = br.read(8)
        if (mapping >= mappingCount) return None
        modes(i) = Mode(blockflag, mapping)
        i += 1
      }
      if (br.readBit() != 1) return None // framing
      Some(Setup(books, floors, residues, mappings, modes))
    } catch { case _: EndOfPacket => None }

  // ------------------------------------------------------------------
  // Floor 1 rendering (spec section 7.2.3/7.2.4, 9.2.6/9.2.7)
  // ------------------------------------------------------------------

  /** `floor1_inverse_dB_table` DERIVED, not transcribed: the spec's
    * 256 float32 entries run 1.0649863e-07 .. 1.0 in a uniform
    * 140/256 dB step, i.e. exactly 10^((i-255)*7/256).
    */
  private[ext] val inverseDb: Array[Double] =
    Array.tabulate(256)(i => math.pow(10.0, (i - 255) * 7.0 / 256.0))

  private[ext] def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int,
      x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  /** Integer Bresenham line render per spec 9.2.7, writing y values
    * into v over [x0, min(x1, v.length)).
    */
  private[ext] def renderLine(x0: Int, y0: Int, x1: Int, y1: Int,
      v: Array[Int]): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    var x = x0
    var y = y0
    var err = 0
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x0 < v.length) v(x0) = y
    x = x0 + 1
    while (x < x1 && x < v.length) {
      err += ady
      if (err >= adx) { err -= adx; y += sy }
      else y += base
      v(x) = y
      x += 1
    }
  }

  /** Decoded floor-1 state for one channel in one frame: the quantized
    * Y list (before curve synthesis), or null for an unaudible channel.
    */
  /** Floor0 packet decode (spec 6.2.2): amplitude, then LSP
    * coefficients accumulated "in VQ context" — each vector's scalars
    * get the running `last` added, `last` becomes the final scalar of
    * the vector, vectors concatenate until `order` coefficients exist
    * (excess discarded). Returns [amplitude, coeff0, coeff1, ...], or
    * null for an unused (amplitude 0) channel. A book number past the
    * floor's book list is a bit-desync, not a lost vector — the whole
    * FRAME abandons (IllegalStateException past the EOP handler).
    */
  private def decodeFloor0Header(br: BitReader, f: Floor0,
      books: Array[Codebook]): Array[Double] = {
    // amplitude_bits is a 6-bit header field (up to 63): read in Long —
    // read()'s Int accumulator wraps shifts mod 32, so a spec-legal
    // ampBits > 31 would decode garbage (a true-zero unused channel
    // could read nonzero and fabricate an envelope)
    val amplitude = br.readLong(f.ampBits)
    if (amplitude == 0L) return null
    val booknumber = br.read(ilog(f.bookList.length))
    if (booknumber >= f.bookList.length)
      throw new IllegalStateException("floor0 book number")
    val book = books(f.bookList(booknumber))
    val out = new Array[Double](1 + f.order)
    out(0) = amplitude.toDouble
    val vec = new Array[Double](book.dim)
    var last = 0.0
    var i = 0
    while (i < f.order) {
      book.decodeVq(br, vec, 0)
      var j = 0
      while (j < book.dim) {
        vec(j) += last
        if (i + j < f.order) out(1 + i + j) = vec(j)
        j += 1
      }
      last = vec(book.dim - 1)
      i += book.dim
    }
    out
  }

  /** Bark map (spec 6.2.3): bin i of an n2-bin half-spectrum maps to
    * min(barkMapSize-1, floor(bark(rate*i/(2*n2)) * barkMapSize /
    * bark(rate/2))). The bark warp constants (13.1/0.00074, 2.24/
    * 1.85e-8, 0.0001) are transcribed from the spec's own bark()
    * definition — validation is structural only (monotone
    * non-decreasing, 0 at DC, clamped top), the same honest caveat as
    * [[Mp3]]'s substitution #3; a mis-recalled constant would warp
    * wild-stream envelopes while fixtures (encoder shares the map)
    * stay green.
    */
  private[ext] def barkMap(f: Floor0, n2: Int): Array[Int] =
    f.mapCache.getOrElseUpdate(n2, {
      def bark(x: Double): Double =
        13.1 * math.atan(0.00074 * x) +
          2.24 * math.atan(1.85e-8 * x * x) + 1e-4 * x
      val c = f.barkMapSize / bark(0.5 * f.rate)
      Array.tabulate(n2) { i =>
        math.min(f.barkMapSize - 1,
          math.floor(bark(f.rate.toDouble * i / (2.0 * n2)) * c).toInt)
      }
    })

  /** Floor0 curve synthesis (spec 6.2.3): the closed-form LSP
    * evaluation. With A(z) the LPC polynomial, P/Q its symmetric/
    * antisymmetric line-spectral decompositions (roots on the unit
    * circle at the coefficient angles, plus the trivial roots at
    * z = +-1), |A(e^jw)|^2 = (|P|^2 + |Q|^2)/4 because e^{jw(M+1)/2}P
    * is real and e^{jw(M+1)/2}Q imaginary; each conjugate root pair
    * contributes |.|^2 = 4(cos(theta) - cos(w))^2 and the trivial
    * roots 2 -+ 2cos(w) — which is exactly the spec's p/q product
    * form (even order: odd-indexed coefficients with (1-cos w)/2,
    * even-indexed with (1+cos w)/2; odd order: (1-cos^2 w) against
    * the odd-indexed product, 1/4 against the even-indexed). The
    * identity is pinned in VorbisSpec against a direct complex
    * polynomial evaluation of P and Q built from the same roots. The
    * dB-to-linear step uses the spec's own 0.11512925 (= ln(10)/20
    * truncated). Values repeat across bins sharing a bark index (the
    * spec's step-7 run-length rule — equal by construction here since
    * the curve depends on the bin only through map[i]).
    */
  private[ext] def renderFloor0(f: Floor0, data: Array[Double],
      n2: Int): Array[Double] = {
    val amplitude = data(0)
    val order = f.order
    val cosC = new Array[Double](order)
    var k = 0
    while (k < order) { cosC(k) = math.cos(data(1 + k)); k += 1 }
    val map = barkMap(f, n2)
    val out = new Array[Double](n2)
    val ampDiv = (1L << f.ampBits) - 1
    var i = 0
    while (i < n2) {
      val m = map(i)
      val cosW = math.cos(math.Pi * m / f.barkMapSize)
      var p = 0.0
      var q = 0.0
      if ((order & 1) == 1) {
        p = 1.0 - cosW * cosW
        q = 0.25
        var j = 0
        while (j <= (order - 3) / 2) {
          val d = cosC(2 * j + 1) - cosW
          p *= 4.0 * d * d
          j += 1
        }
        j = 0
        while (j <= (order - 1) / 2) {
          val d = cosC(2 * j) - cosW
          q *= 4.0 * d * d
          j += 1
        }
      } else {
        p = (1.0 - cosW) / 2.0
        q = (1.0 + cosW) / 2.0
        var j = 0
        while (j < order / 2) {
          val dp = cosC(2 * j + 1) - cosW
          val dq = cosC(2 * j) - cosW
          p *= 4.0 * dp * dp
          q *= 4.0 * dq * dq
          j += 1
        }
      }
      val den = math.max(math.sqrt(p + q), 1e-300)
      // cap the exponent so a wild stream's pinched LSP pair yields a
      // huge-but-FINITE peak (exp overflow to Infinity would turn the
      // spec's 0 * curve unaudible bins into NaN samples)
      val linear = math.exp(math.min(700.0, 0.11512925 *
        (amplitude * f.ampOffset / (ampDiv * den) - f.ampOffset)))
      out(i) = linear
      var n = i + 1
      while (n < n2 && map(n) == m) { out(n) = linear; n += 1 }
      i = n
    }
    out
  }

  private def decodeFloor1Header(br: BitReader, f: Floor1,
      books: Array[Codebook]): Array[Int] = {
    if (br.readBit() == 0) return null // unaudible
    val range = Array(256, 128, 86, 64)(f.multiplier - 1)
    val n = f.xList.length
    val y = new Array[Int](n)
    val yBits = ilog(range - 1)
    y(0) = br.read(yBits)
    y(1) = br.read(yBits)
    var offset = 2
    var i = 0
    while (i < f.partitions) {
      val cls = f.classList(i)
      val cdim = f.classDims(cls)
      val cbits = f.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0)
        cval = books(f.classMasterbooks(cls)).decodeScalar(br)
      var j = 0
      while (j < cdim) {
        val book = f.subclassBooks(cls)(cval & csub)
        cval >>>= cbits
        y(offset + j) =
          if (book >= 0) books(book).decodeScalar(br) else 0
        j += 1
      }
      offset += cdim
      i += 1
    }
    y
  }

  /** Curve synthesis: quantized Ys -> amplitude floor of length n2
    * (spec 7.2.3 step 2 + 7.2.4).
    */
  private[ext] def renderFloor1(f: Floor1, y: Array[Int],
      n2: Int): Array[Double] = {
    val range = Array(256, 128, 86, 64)(f.multiplier - 1)
    val nv = f.xList.length
    val finalY = new Array[Int](nv)
    val step2 = new Array[Boolean](nv)
    step2(0) = true; step2(1) = true
    finalY(0) = y(0); finalY(1) = y(1)
    var i = 2
    while (i < nv) {
      // low/high neighbors: among indices BEFORE i, the nearest X
      // below/above X[i]
      var lo = 0; var hi = 1
      var j = 0
      while (j < i) {
        val xj = f.xList(j)
        if (xj < f.xList(i) && xj > f.xList(lo)) lo = j
        if (xj > f.xList(i) && xj < f.xList(hi)) hi = j
        j += 1
      }
      val predicted = renderPoint(f.xList(lo), finalY(lo),
        f.xList(hi), finalY(hi), f.xList(i))
      val v = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = math.min(highroom, lowroom) * 2
      if (v != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        finalY(i) =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + predicted
            else predicted - (v - highroom) - 1
          } else {
            if ((v & 1) == 1) predicted - ((v + 1) / 2)
            else predicted + v / 2
          }
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      if (finalY(i) < 0) finalY(i) = 0
      if (finalY(i) > range - 1) finalY(i) = range - 1
      i += 1
    }
    // render in ascending-X order through the step2-flagged points
    val curve = new Array[Int](n2)
    var hx = 0
    var hy = 0
    var lx = 0
    var ly = finalY(f.sortOrder(0)) * f.multiplier
    var k = 1
    while (k < nv) {
      val j = f.sortOrder(k)
      if (step2(j)) {
        hx = f.xList(j)
        hy = finalY(j) * f.multiplier
        renderLine(lx, ly, hx, hy, curve)
        lx = hx
        ly = hy
      }
      k += 1
    }
    if (hx < n2) {
      var x = hx
      while (x < n2) { curve(x) = hy; x += 1 }
    }
    val out = new Array[Double](n2)
    i = 0
    while (i < n2) {
      var c = curve(i)
      if (c < 0) c = 0
      if (c > 255) c = 255
      out(i) = inverseDb(c)
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // Residue decode (spec section 8.6)
  // ------------------------------------------------------------------

  /** Decode one residue configuration into `vectors` (one per channel
    * in the submap, each of length n2), honoring doNotDecode flags.
    */
  private def decodeResidue(br: BitReader, r: Residue,
      books: Array[Codebook], vectors: Array[Array[Double]],
      doNotDecode: Array[Boolean], n2: Int): Unit = {
    val ch = vectors.length
    if (ch == 0) return
    if (r.resType == 2) {
      var all = true
      var j = 0
      while (j < ch) { if (!doNotDecode(j)) all = false; j += 1 }
      if (all) return
      val inter = new Array[Double](n2 * ch)
      decodeResidueInner(br, r, books, Array(inter), Array(false),
        n2 * ch, format1 = true)
      var i = 0
      while (i < n2) {
        j = 0
        while (j < ch) {
          vectors(j)(i) = inter(i * ch + j)
          j += 1
        }
        i += 1
      }
    } else {
      decodeResidueInner(br, r, books, vectors, doNotDecode, n2,
        format1 = r.resType == 1)
    }
  }

  private def decodeResidueInner(br: BitReader, r: Residue,
      books: Array[Codebook], v: Array[Array[Double]],
      doNotDecode: Array[Boolean], actualSize: Int,
      format1: Boolean): Unit = {
    val limitBegin = math.min(r.begin, actualSize)
    val limitEnd = math.min(r.end, actualSize)
    if (limitEnd <= limitBegin) return
    val psize = r.partitionSize
    val partitionsToRead = (limitEnd - limitBegin) / psize
    if (partitionsToRead == 0) return
    val ch = v.length
    val classbook = books(r.classbook)
    val cw = classbook.dim // classwords per codeword
    val rows = partitionsToRead + cw // slack for the classword tail
    val classifications = Array.ofDim[Int](ch, rows)
    var pass = 0
    while (pass < 8) {
      var partitionCount = 0
      while (partitionCount < partitionsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < ch) {
            if (!doNotDecode(j)) {
              var temp = classbook.decodeScalar(br)
              var i = cw - 1
              while (i >= 0) {
                if (partitionCount + i < rows)
                  classifications(j)(partitionCount + i) =
                    temp % r.classifications
                temp /= r.classifications
                i -= 1
              }
            }
            j += 1
          }
        }
        var i = 0
        while (i < cw && partitionCount < partitionsToRead) {
          var j = 0
          while (j < ch) {
            if (!doNotDecode(j)) {
              val vqClass = classifications(j)(partitionCount)
              val book = r.books(vqClass)(pass)
              if (book >= 0) {
                val cb = books(book)
                val offset = limitBegin + partitionCount * psize
                if (format1) {
                  var k = 0
                  val tmp = new Array[Double](cb.dim)
                  while (k < psize) {
                    cb.decodeVq(br, tmp, 0)
                    var d = 0
                    while (d < cb.dim && k < psize) {
                      v(j)(offset + k) += tmp(d)
                      d += 1
                      k += 1
                    }
                  }
                } else { // format 0: strided interleave
                  val step = psize / cb.dim
                  val tmp = new Array[Double](cb.dim)
                  var k = 0
                  while (k < step) {
                    cb.decodeVq(br, tmp, 0)
                    var d = 0
                    while (d < cb.dim) {
                      v(j)(offset + k + d * step) += tmp(d)
                      d += 1
                    }
                    k += 1
                  }
                }
              }
            }
            j += 1
          }
          partitionCount += 1
          i += 1
        }
      }
      pass += 1
    }
  }

  // ------------------------------------------------------------------
  // IMDCT / MDCT (spec 4.3.6; fast form via a zero-padded FFT)
  // ------------------------------------------------------------------

  /** Direct O(n^2) IMDCT straight off the spec definition — the test
    * oracle for the fast path and never used in production decode.
    */
  private[ext] def imdctDirect(x: Array[Double], n: Int): Array[Double] = {
    val m = n / 2
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      var acc = 0.0
      var i = 0
      while (i < m) {
        acc += x(i) * math.cos(
          math.Pi / (2.0 * n) * (2 * j + 1 + m) * (2 * i + 1))
        i += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }

  /** Fast IMDCT: the kernel cos(pi/(4M)(2j+1+M)(2i+1)) factors into a
    * DCT-IV, which this evaluates at the odd bins of one zero-padded
    * 4M-point FFT (O(n log n), exact to fp error — VorbisSpec pins it
    * against [[imdctDirect]]). M = n/2 spectral lines in, n samples
    * out via the DCT-IV shift/reflection identities.
    */
  private[ext] def imdct(x: Array[Double], n: Int): Array[Double] = {
    val m = n / 2
    val size = 4 * m
    val re = new Array[Double](size)
    val im = new Array[Double](size)
    var i = 0
    while (i < m) { re(i) = x(i); i += 1 }
    AudioDsp.fft(re, im)
    // Z[k] = Re(e^{-i pi (2k+1)/(4M)} F[2k+1]) is the DCT-IV of x
    val z = new Array[Double](m)
    var k = 0
    while (k < m) {
      val ang = -math.Pi * (2 * k + 1) / (4.0 * m)
      val c = math.cos(ang); val s = math.sin(ang)
      val b = 2 * k + 1
      z(k) = re(b) * c - im(b) * s
      k += 1
    }
    // y[j] = E(j + M/2) with E(k)=Z[k] on [0,M), E(2M-1-k)=-Z[k],
    // E(k+2M)=-E(k)
    val out = new Array[Double](n)
    var j = 0
    while (j < m / 2) { out(j) = z(j + m / 2); j += 1 }
    while (j < 3 * m / 2) { out(j) = -z(3 * m / 2 - 1 - j); j += 1 }
    while (j < n) { out(j) = -z(j - 3 * m / 2); j += 1 }
    out
  }

  /** Forward MDCT over n windowed samples -> n/2 coefficients, scaled
    * so that imdct(mdct(s)) + TDAC overlap reconstructs s exactly
    * (the Vorbis window is power-complementary). Same zero-padded-FFT
    * evaluation, encoder-only.
    */
  private[ext] def mdct(s: Array[Double]): Array[Double] = {
    val n = s.length
    val m = n / 2
    val size = 4 * m
    val re = new Array[Double](size)
    val im = new Array[Double](size)
    var j = 0
    while (j < n) { re(j) = s(j); j += 1 }
    AudioDsp.fft(re, im)
    val out = new Array[Double](m)
    var i = 0
    while (i < m) {
      val b = (2 * i + 1) % size
      val ang = -math.Pi * (2 * i + 1) * (m + 1) / (4.0 * m)
      val c = math.cos(ang); val sn = math.sin(ang)
      // X[i] = Re(e^{i ang} G[2i+1]); the 2/n scale makes the
      // round-trip identity hold (DCT-IV selfinverse up to n/4... the
      // exact constant is pinned by VorbisSpec's TDAC round-trip)
      out(i) = (re(b) * c - im(b) * sn) * (2.0 / m)
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // Windows and overlap-add (spec 1.3.2, 4.3.8)
  // ------------------------------------------------------------------

  /** The Vorbis window slope: sin(pi/2 * sin^2(pi/2 * (i+0.5)/n)). */
  private def slope(i: Int, n: Int): Double = {
    val s = math.sin(math.Pi / 2.0 * (i + 0.5) / n)
    math.sin(math.Pi / 2.0 * s * s)
  }

  /** Window for a frame of size n whose left/right slopes span
    * leftN/rightN samples (slopes centered at n/4 and 3n/4 when
    * reduced — the long-block-next-to-short geometry).
    */
  private[ext] def window(n: Int, leftN: Int, rightN: Int)
      : Array[Double] = {
    val w = new Array[Double](n)
    val leftStart = n / 4 - leftN / 2
    val rightStart = 3 * n / 4 - rightN / 2
    var i = 0
    while (i < n) {
      w(i) =
        if (i < leftStart) 0.0
        else if (i < leftStart + leftN) slope(i - leftStart, leftN)
        else if (i < rightStart) 1.0
        else if (i < rightStart + rightN)
          slope(rightN - 1 - (i - rightStart), rightN)
        else 0.0
      i += 1
    }
    w
  }

  // ------------------------------------------------------------------
  // Stream decode
  // ------------------------------------------------------------------

  /** Geometry without sample decode: (channels, rate, blocksize0,
    * blocksize1) from the identification header.
    */
  private def parseIdHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] =
    try {
      val br = new BitReader(p)
      if (br.read(8) != 1) return None
      var i = 0
      while (i < 6) { br.read(8); i += 1 }
      if (br.readLong(32) != 0L) return None // vorbis_version
      val channels = br.read(8)
      val rate = br.readLong(32)
      br.readLong(32); br.readLong(32); br.readLong(32) // bitrates
      val bs0 = 1 << br.read(4)
      val bs1 = 1 << br.read(4)
      if (channels < 1 || channels > 16 || rate <= 0 ||
        rate > Int.MaxValue || bs0 < 64 || bs0 > 8192 || bs1 < bs0 ||
        bs1 > 8192 || br.readBit() != 1) return None
      Some((channels, rate.toInt, bs0, bs1))
    } catch { case _: EndOfPacket => None }

  /** Decode a complete Ogg-Vorbis stream to a mono mix — the
    * [[Mp3.decode]] contract: (samples in [-1,1], sampleRate), None
    * on anything outside the implemented surface (bad headers,
    * CRC-corrupt first page, non-Vorbis Ogg). Both floor types decode
    * (floor1 piecewise-linear, floor0 legacy LSP).
    */
  private val VorbisBos: (Array[Byte], Int, Int) => Boolean = (p, o, n) =>
    n >= 7 && p(o) == 1 && p(o + 1) == 'v' && p(o + 2) == 'o' &&
      p(o + 3) == 'r' && p(o + 4) == 'b' && p(o + 5) == 'i' &&
      p(o + 6) == 's'

  /** The comment-header (second) packet of the first Vorbis stream —
    * the provenance surface [[AudioTags]] reads.
    */
  private[ext] def commentPacketOf(b: Array[Byte]): Option[Array[Byte]] =
    if (!isOggVorbis(b)) None
    else oggPackets(b, VorbisBos).flatMap { case (ps, _) =>
      ps.lift(1).filter(p => p.length >= 7 && p(0) == 3)
    }

  def decode(b: Array[Byte]): Option[(Array[Double], Int)] = try {
    if (!isOggVorbis(b)) return None
    val (packets, finalGranule) = oggPackets(b, VorbisBos) match {
      case Some(v) => v
      case None    => return None
    }
    if (packets.length < 3) return None
    val (channels, rate, bs0, bs1) = parseIdHeader(packets(0)) match {
      case Some(v) => v
      case None    => return None
    }
    // packets(1) is the comment header: only its type is validated
    if (packets(1).length < 1 || packets(1)(0) != 3) return None
    val setup = parseSetup(packets(2), channels) match {
      case Some(s) => s
      case None    => return None
    }
    val modeBits = ilog(setup.modes.length - 1)
    val mix = new scala.collection.mutable.ArrayBuilder.ofDouble
    mix.sizeHint(1 << 16)
    // per-channel windowed previous frame (its right half laps us)
    var prevRight: Array[Array[Double]] = null // [ch][prevN] full frames
    var prevN = 0
    var p = 3
    while (p < packets.length) {
      val pk = packets(p)
      if (pk.length > 0 && (pk(0) & 1) == 0) {
        try {
          val br = new BitReader(pk)
          if (br.readBit() == 0) {
            val mode = setup.modes(br.read(modeBits))
            val mapping = setup.mappings(mode.mapping)
            val n = if (mode.blockflag == 1) bs1 else bs0
            var prevFlag = 1
            var nextFlag = 1
            if (mode.blockflag == 1) { // read even when bs0 == bs1
              prevFlag = br.readBit()
              nextFlag = br.readBit()
            }
            val n2 = n / 2
            // ---- floors + residues: spec 4.3 — EOP from here on is NOT
            // packet loss; every vector not fully decoded is zeroed and
            // decode "continues as normal" through synthesis and
            // overlap-add (abandoning the frame would drop the lapped
            // tail and drift against granule positions). floorData holds
            // Array[Int] quantized Ys for floor1, [amplitude, coeffs...]
            // doubles for floor0; null = unaudible channel.
            var ch = 0
            val floorData = new Array[AnyRef](channels)
            val noResidue = new Array[Boolean](channels)
            val residueVec = Array.ofDim[Double](channels, n2)
            try {
              ch = 0
              while (ch < channels) {
                val submap = mapping.mux(ch)
                floorData(ch) =
                  setup.floors(mapping.submapFloor(submap)) match {
                    case f: Floor1 =>
                      decodeFloor1Header(br, f, setup.codebooks)
                    case f: Floor0 =>
                      decodeFloor0Header(br, f, setup.codebooks)
                  }
                noResidue(ch) = floorData(ch) == null
                ch += 1
              }
              // coupling rescue: a coupled pair decodes residue if
              // EITHER side is audible
              var st = 0
              while (st < mapping.couplingMag.length) {
                val m = mapping.couplingMag(st)
                val a = mapping.couplingAng(st)
                if (!noResidue(m) || !noResidue(a)) {
                  noResidue(m) = false; noResidue(a) = false
                }
                st += 1
              }
              // ---- residues, per submap ----
              var sm = 0
              while (sm < mapping.submaps) {
                val chIdx = (0 until channels).filter(mapping.mux(_) == sm)
                if (chIdx.nonEmpty) {
                  val vecs = chIdx.map(residueVec(_)).toArray
                  val dnd = chIdx.map(noResidue(_)).toArray
                  decodeResidue(br, setup.residues(mapping.submapResidue(sm)),
                    setup.codebooks, vecs, dnd, n2)
                }
                sm += 1
              }
            } catch {
              // truncated packet: un-decoded floors stay null (zero
              // curve → silent channel), partially-written residues
              // keep their zero tails — fall through to synthesis
              case _: EndOfPacket => ()
            }
            // ---- inverse coupling (square polar), reverse order ----
            var st = mapping.couplingMag.length - 1
            while (st >= 0) {
              val mv = residueVec(mapping.couplingMag(st))
              val av = residueVec(mapping.couplingAng(st))
              var i = 0
              while (i < n2) {
                val m = mv(i); val a = av(i)
                if (m > 0) {
                  if (a > 0) { mv(i) = m; av(i) = m - a }
                  else { av(i) = m; mv(i) = m + a }
                } else {
                  if (a > 0) { mv(i) = m; av(i) = m + a }
                  else { av(i) = m; mv(i) = m - a }
                }
                i += 1
              }
              st -= 1
            }
            // ---- floor curve * residue, IMDCT, window ----
            val shortN = bs0
            val leftSlope = if (prevFlag == 1) n2 else shortN / 2
            val rightSlope = if (nextFlag == 1) n2 else shortN / 2
            val w = window(n, leftSlope, rightSlope)
            val frames = new Array[Array[Double]](channels)
            ch = 0
            while (ch < channels) {
              val spectrum =
                if (floorData(ch) == null) new Array[Double](n2)
                else {
                  val curve =
                    setup.floors(mapping.submapFloor(mapping.mux(ch))) match {
                      case f: Floor1 =>
                        renderFloor1(f, floorData(ch).asInstanceOf[Array[Int]], n2)
                      case f: Floor0 =>
                        renderFloor0(f, floorData(ch).asInstanceOf[Array[Double]], n2)
                    }
                  val r = residueVec(ch)
                  var i = 0
                  while (i < n2) { r(i) *= curve(i); i += 1 }
                  r
                }
              val td = imdct(spectrum, n)
              var i = 0
              while (i < n) { td(i) *= w(i); i += 1 }
              frames(ch) = td
              ch += 1
            }
            // ---- center-aligned overlap-add, mono-mixed ----
            if (prevRight != null) {
              // previous right half overlaps current left half; the
              // overlap spans min(prevN, n)/2 samples centered on the
              // frame joint, and the flats on either side pass through
              val emit = prevN / 4 + n / 4
              val joint = emit // samples from prev center to cur center
              var i = 0
              while (i < emit) {
                var acc = 0.0
                // position i past the previous frame's center
                val pi = prevN / 2 + i
                // the same absolute position in current-frame coords:
                // current center (n/2) is `joint` past prev center
                val ci = n / 2 - joint + i
                ch = 0
                while (ch < channels) {
                  if (pi < prevN) acc += prevRight(ch)(pi)
                  if (ci >= 0 && ci < n) acc += frames(ch)(ci)
                  ch += 1
                }
                mix += acc / channels
                i += 1
              }
            }
            prevRight = frames
            prevN = n
          }
        } catch {
          // Reaching here means EOP BEFORE the mode/window flags were
          // fully read (spec: the packet yields no frame), a floor0
          // book number past its book list (a bit-desync, spec 6.2.2
          // "undecodable"), or malformed-packet arithmetic (bad mode
          // index, hostile sizes): the FRAME is abandoned, the stream
          // continues. EOP DURING vector decode never lands here — the
          // inner handler zeroes the remaining vectors and falls
          // through to overlap-add per spec 4.3.
          case _: EndOfPacket                  => ()
          case scala.util.control.NonFatal(_) => ()
        }
      }
      p += 1
    }
    var samples = mix.result()
    if (finalGranule >= 0 && finalGranule < samples.length)
      samples = java.util.Arrays.copyOf(samples, finalGranule.toInt)
    if (samples.isEmpty) None else Some((samples, rate))
  } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------
  // Fixture encoder
  // ------------------------------------------------------------------

  private val ShortBlock = 256
  private val LongBlock = 1024

  /** Balanced Kraft-exact code lengths for n entries: (2^L - n)
    * entries at L-1 bits, the rest at L = ceil(log2 n) bits.
    */
  private def balancedLengths(n: Int): Array[Int] = {
    if (n == 1) return Array(1)
    val lp = ilog(n - 1) // = ceil(log2 n) for n >= 2
    val short = (1 << lp) - n
    Array.tabulate(n)(i => if (i < short) lp - 1 else lp)
  }

  /** The fixture's codebooks: a 2-class classification book, two
    * 15x15 explicit-lookup lattice books (coarse 0.5, fine 0.0625
    * steps) for the two residue passes, a 256-entry scalar book for
    * the floor1 coded Y values, and (when `floor0` is set) a dim-1
    * 64-level LSP-delta book — dyadic min/delta (1/64) so the values
    * survive float32Pack exactly and encoder/decoder curves agree
    * bit-for-bit.
    */
  private def fixtureBooks(lookup1: Boolean = false,
      floor0: Boolean = false): Array[Codebook] = {
    def lattice(delta: Double): Codebook = {
      val entries = 225
      // lookup type 2: explicit per-entry values; lookup type 1: the
      // implicit 15-value lattice (lookup_values = 15, 15^2 = entries)
      // indexed (entry / 15^d) % 15 per dimension
      val mults =
        if (lookup1) Array.tabulate(15)(identity)
        else {
          val m = new Array[Int](entries * 2)
          var e = 0
          while (e < entries) {
            m(e * 2) = e / 15
            m(e * 2 + 1) = e % 15
            e += 1
          }
          m
        }
      val cb = new Codebook(2, entries, balancedLengths(entries),
        if (lookup1) 1 else 2,
        -7 * delta, delta, sequenceP = false, mults,
        if (lookup1) 15 else entries * 2)
      require(cb.build() && cb.isComplete, "fixture lattice book")
      cb
    }
    val classBook = new Codebook(2, 4, Array(2, 2, 2, 2), 0, 0, 0,
      sequenceP = false, Array.emptyIntArray, 0)
    require(classBook.build() && classBook.isComplete, "fixture classbook")
    val floorBook = new Codebook(1, 256, balancedLengths(256), 0, 0, 0,
      sequenceP = false, Array.emptyIntArray, 0)
    require(floorBook.build() && floorBook.isComplete, "fixture floorbook")
    val base = Array(classBook, lattice(0.5), lattice(0.0625), floorBook)
    if (!floor0) base
    else {
      val deltaBook = new Codebook(1, 64, balancedLengths(64), 2,
        Floor0Delta, Floor0Delta, sequenceP = false,
        Array.tabulate(64)(identity), 64)
      require(deltaBook.build() && deltaBook.isComplete, "floor0 book")
      base :+ deltaBook
    }
  }

  /** Floor0 fixture config: min/delta of the LSP-delta book (dyadic so
    * float32Pack round-trips exactly) and the header the decoder will
    * parse — shared so the encoder fits and renders through the EXACT
    * decode-path curve.
    */
  private val Floor0Delta = 1.0 / 64
  private[ext] def fixtureFloor0(rate: Int, order: Int = 8): Floor0 =
    Floor0(order = order, rate = math.min(rate, 65535), barkMapSize = 256,
      ampBits = 6, ampOffset = 64, bookList = Array(4))

  /** Bark-warped LPC -> LSP fit for the floor0 fixture encoder (the
    * floor1 real-envelope-fit precedent): autocorrelation of the
    * frame's MDCT power spectrum ON THE WARPED AXIS the decoder
    * evaluates (r_k = sum_i P_i cos(k*phi_i), phi_i = pi*map[i]/
    * barkMapSize), Levinson-Durbin to the floor's order, P/Q
    * symmetric decomposition reduced by the trivial +-1 roots, and
    * Chebyshev-form root isolation by grid scan + bisection — all
    * classic public DSP (Levinson recursion; Itakura line spectral
    * pairs). Degenerate frames (silence, reflection blowup, a root
    * deficit from numerically coincident roots) fall back to the even
    * LSP spread — still a valid stream, just a flatter envelope.
    */
  private[ext] def lspFit(spec: Array[Double], cfg: Floor0): Array[Double] = {
    val n2 = spec.length
    val m0 = cfg.order
    val fallback = Array.tabulate(m0)(j => (j + 1) * math.Pi / (m0 + 1))
    val map = barkMap(cfg, n2)
    val r = new Array[Double](m0 + 1)
    var k = 0
    while (k <= m0) {
      var s = 0.0
      var i = 0
      while (i < n2) {
        val p = spec(i) * spec(i)
        s += p * math.cos(k * math.Pi * map(i) / cfg.barkMapSize)
        i += 1
      }
      r(k) = s
      k += 1
    }
    if (r(0) <= 1e-12) return fallback
    r(0) *= 1.001 // white-noise ridge: bounds the fit's spectral tilt
    // Levinson-Durbin: A(z) = 1 + sum a_j z^-j minimizing warped error
    val a = new Array[Double](m0 + 1)
    a(0) = 1.0
    var err = r(0)
    var m = 1
    while (m <= m0) {
      var acc = r(m)
      var j = 1
      while (j < m) { acc += a(j) * r(m - j); j += 1 }
      val kref = -acc / err
      if (!(math.abs(kref) < 1.0)) return fallback
      val prev = a.clone()
      j = 1
      while (j < m) { a(j) = prev(j) + kref * prev(m - j); j += 1 }
      a(m) = kref
      err *= 1.0 - kref * kref
      if (err <= 0) return fallback
      m += 1
    }
    // bandwidth expansion (a_j *= gamma^j): tonal frames put LPC poles
    // ON the unit circle, pinching LSP pairs shut — the envelope then
    // swallows all the energy and the residue lattice has nothing left
    // to resolve. Damping the poles keeps the curve's dynamic range
    // lattice-sized; the amplitude search makes up the level.
    var g = 1.0
    var bj = 1
    while (bj <= m0) { g *= 0.85; a(bj) *= g; bj += 1 }
    // P = A(z) + z^-(M+1) A(1/z), Q = A(z) - z^-(M+1) A(1/z); even M:
    // P carries the trivial root at z=-1, Q at z=+1 — divide them out
    val h = m0 / 2
    val pc = new Array[Double](m0 + 1)
    val qc = new Array[Double](m0 + 1)
    var j = 0
    while (j <= m0) {
      val aj = a(j)
      val ar = if (j >= 1) a(m0 + 1 - j) else 0.0
      val pj = aj + ar
      val qj = aj - ar
      pc(j) = if (j == 0) pj else pj - pc(j - 1)
      qc(j) = if (j == 0) qj else qj + qc(j - 1)
      j += 1
    }
    // symmetric degree-M poly on the unit circle as a Chebyshev series
    // in x = cos(w): g(x) = c_h + 2 sum_{k=1..h} c_{h-k} T_k(x)
    def cheb(c: Array[Double], x: Double): Double = {
      var sum = c(h)
      var tkm1 = 1.0
      var tk = x
      var kk = 1
      while (kk <= h) {
        sum += 2.0 * c(h - kk) * tk
        val t = 2.0 * x * tk - tkm1
        tkm1 = tk
        tk = t
        kk += 1
      }
      sum
    }
    def roots(c: Array[Double]): Array[Double] = {
      val found = new scala.collection.mutable.ArrayBuffer[Double](h)
      val grid = 1024
      var prevX = 1.0 - 1e-9
      var prevV = cheb(c, prevX)
      var g = 1
      while (g <= grid && found.length < h) {
        val x = 1.0 - 1e-9 - (2.0 - 2e-9) * g / grid
        val v = cheb(c, x)
        if (v == 0.0) found += x
        else if (v * prevV < 0) {
          var lo = x // cheb(lo) = v side
          var hi = prevX
          var it = 0
          while (it < 60) {
            val mid = 0.5 * (lo + hi)
            if (cheb(c, mid) * v > 0) lo = mid else hi = mid
            it += 1
          }
          found += 0.5 * (lo + hi)
        }
        prevX = x
        prevV = v
        g += 1
      }
      found.toArray
    }
    val pr = roots(pc) // descending x = ascending angle
    val qr = roots(qc)
    if (pr.length != h || qr.length != h) return fallback
    // interlace: ascending LSP angles alternate P, Q, P, Q... with the
    // sum polynomial P owning the lowest (even 0-based) slots
    val out = new Array[Double](m0)
    k = 0
    while (k < h) {
      out(2 * k) = math.acos(pr(k))
      out(2 * k + 1) = math.acos(qr(k))
      k += 1
    }
    k = 1
    while (k < m0) {
      if (out(k) <= out(k - 1)) return fallback // lost interlacing
      k += 1
    }
    out
  }

  /** The fixture floor's X grid: 0 and 2^rangebits implicit, eight
    * interior points in deliberately UNSORTED partition order (the
    * decoder's sortOrder/neighbor-prediction machinery must reorder).
    */
  private val FloorInteriorX = Array(32, 128, 512, 2048, 64, 256, 1024, 3072)

  /** The fixture floor config as the decoder will parse it, shared so
    * the encoder renders its curve through the EXACT decode path.
    */
  private def fixtureFloor(): Floor1 = {
    val xList = Array(0, 1 << FloorRangeBits) ++ FloorInteriorX
    Floor1(partitions = 2, classList = Array(0, 0),
      classDims = Array(4), classSubclasses = Array(0),
      classMasterbooks = Array(-1), subclassBooks = Array(Array(3)),
      multiplier = 1, xList = xList,
      sortOrder = xList.indices.sortBy(xList(_)).toArray)
  }

  /** The floor-value prediction INVERSE (of renderFloor1's step 2):
    * the coded val that makes the decoder land exactly `y` given
    * `predicted`. Total for y, predicted in [0, range).
    */
  private[ext] def floorValFor(y: Int, predicted: Int, range: Int): Int = {
    val diff = y - predicted
    if (diff == 0) return 0
    val highroom = range - predicted
    val lowroom = predicted
    val room = math.min(highroom, lowroom) * 2
    val small = if (diff >= 0) 2 * diff else -2 * diff - 1
    if (small < room) small
    else if (highroom > lowroom) diff + lowroom
    else -diff - 1 + highroom
  }

  private def writeCodebook(w: BitWriter, cb: Codebook): Unit = {
    w.write(0x564342, 24)
    w.write(cb.dim, 16)
    w.write(cb.entries, 24)
    w.write(0, 1) // unordered
    w.write(0, 1) // not sparse
    var i = 0
    while (i < cb.entries) { w.write(cb.lengths(i) - 1, 5); i += 1 }
    w.write(cb.lookupType, 4)
    if (cb.lookupType > 0) {
      w.write(float32Pack(cb.minV), 32)
      w.write(float32Pack(cb.deltaV), 32)
      val valueBits = math.max(1, ilog(cb.mults.max))
      w.write(valueBits - 1, 4)
      w.write(0, 1) // sequence_p
      i = 0
      while (i < cb.mults.length) { w.write(cb.mults(i), valueBits); i += 1 }
    }
  }

  private def idHeaderPacket(channels: Int, rate: Int): Array[Byte] = {
    val w = new BitWriter
    w.write(1, 8)
    "vorbis".getBytes("US-ASCII").foreach(c => w.write(c & 0xffL, 8))
    w.write(0, 32) // version
    w.write(channels, 8)
    w.write(rate.toLong, 32)
    w.write(0, 32); w.write(0, 32); w.write(0, 32) // bitrates
    w.write(ilog(ShortBlock) - 1, 4) // blocksize_0 exponent (8)
    w.write(ilog(LongBlock) - 1, 4) // blocksize_1 exponent (10)
    w.write(1, 1)
    w.toBytes
  }

  private def commentPacket(
      comments: Seq[(String, String)] = Nil): Array[Byte] = {
    val w = new BitWriter
    w.write(3, 8)
    "vorbis".getBytes("US-ASCII").foreach(c => w.write(c & 0xffL, 8))
    val vendor = "graft".getBytes("US-ASCII")
    w.write(vendor.length.toLong, 32)
    vendor.foreach(c => w.write(c & 0xffL, 8))
    w.write(comments.length.toLong, 32)
    comments.foreach { case (k, v) =>
      val f = s"$k=$v".getBytes("UTF-8")
      w.write(f.length.toLong, 32)
      f.foreach(c => w.write(c & 0xffL, 8))
    }
    w.write(1, 1)
    w.toBytes
  }

  private val FloorRangeBits = 12

  private def setupPacket(books: Array[Codebook], resType: Int,
      coupled: Boolean, floor0: Option[Floor0] = None,
      submaps: Int = 1, resBegin: Int = 0): Array[Byte] = {
    val w = new BitWriter
    w.write(5, 8)
    "vorbis".getBytes("US-ASCII").foreach(c => w.write(c & 0xffL, 8))
    w.write(books.length - 1, 8)
    books.foreach(writeCodebook(w, _))
    w.write(0, 6); w.write(0, 16) // one time transform, value 0
    w.write(0, 6)
    if (floor0.isDefined) {
      // the legacy-LSP floor, exactly as fixtureFloor0 parses back
      val f = floor0.get
      w.write(0, 16)
      w.write(f.order, 8)
      w.write(f.rate, 16)
      w.write(f.barkMapSize, 16)
      w.write(f.ampBits, 6)
      w.write(f.ampOffset, 8)
      w.write(f.bookList.length - 1, 4)
      f.bookList.foreach(b => w.write(b, 8))
    } else {
      // one floor: type 1, two partitions of one dim-4 class over the
      // fixture X grid (real neighbor-prediction geometry), mult 1
      w.write(1, 16)
      w.write(2, 5) // partitions
      w.write(0, 4); w.write(0, 4) // class list: [0, 0]
      w.write(3, 3) // class 0 dim - 1
      w.write(0, 2) // class 0 subclasses
      w.write(4, 8) // subclass book: floor book 3 (stored +1)
      w.write(0, 2) // multiplier - 1
      w.write(FloorRangeBits, 4)
      FloorInteriorX.foreach(x => w.write(x, FloorRangeBits))
    }
    // one residue: [0, 1024) in 64-sample partitions, two classes
    // (silent / two-pass coded)
    w.write(0, 6)
    w.write(resType, 16)
    w.write(resBegin, 24)
    w.write(1024, 24)
    w.write(63, 24) // partition size - 1
    w.write(1, 6) // classifications - 1
    w.write(0, 8) // classbook
    w.write(0, 3); w.write(0, 1) // class 0 cascade: no passes
    w.write(3, 3); w.write(0, 1) // class 1 cascade: passes 0 and 1
    w.write(1, 8) // class 1 pass 0 -> coarse book
    w.write(2, 8) // class 1 pass 1 -> fine book
    // one mapping: type 0; one submap, or two (stereo channels routed
    // by mux — the multiplexed-submap decode path); square-polar
    // stereo coupling when asked (magnitude ch 0, angle ch 1)
    w.write(0, 6)
    w.write(0, 16)
    if (submaps == 2) {
      w.write(1, 1)
      w.write(1, 4) // submaps - 1
    } else w.write(0, 1)
    if (coupled) {
      w.write(1, 1)
      w.write(0, 8) // one coupling step
      w.write(0, 1) // magnitude = channel 0 (ilog(2-1)=1 bit)
      w.write(1, 1) // angle = channel 1
    } else w.write(0, 1)
    w.write(0, 2) // reserved
    if (submaps == 2) { // mux: channel ch -> submap ch % 2
      w.write(0, 4)
      w.write(1, 4)
    }
    var sm = 0
    while (sm < submaps) {
      w.write(0, 8); w.write(0, 8); w.write(0, 8) // time, floor, residue
      sm += 1
    }
    // two modes: short and long
    w.write(1, 6)
    w.write(0, 1); w.write(0, 16); w.write(0, 16); w.write(0, 8)
    w.write(1, 1); w.write(0, 16); w.write(0, 16); w.write(0, 8)
    w.write(1, 1) // framing
    w.toBytes
  }

  /** Quantize one spectral line to the fixture's two-pass lattice,
    * returning (coarse index -7..7, fine index -7..7).
    */
  private def quantize(v: Double): (Int, Int) = {
    val q0 = math.max(-7, math.min(7, math.round(v / 0.5).toInt))
    val r = v - q0 * 0.5
    val q1 = math.max(-7, math.min(7, math.round(r / 0.0625).toInt))
    (q0, q1)
  }

  /** One audio packet: mode, window flags, two-point floor line per
    * channel, two-pass residue in the configured format, optional
    * square-polar coupling.
    */
  private def audioPacket(books: Array[Codebook],
      spectra: Array[Array[Double]], longBlock: Boolean,
      prevLong: Boolean, nextLong: Boolean, resType: Int,
      coupled: Boolean, submaps: Int = 1, resBegin: Int = 0,
      floor0Cfg: Option[Floor0] = None): Array[Byte] = {
    val w = new BitWriter
    val channels = spectra.length
    val n2 = spectra(0).length
    w.write(0, 1) // audio packet
    w.write(if (longBlock) 1 else 0, 1) // mode number (1 bit: 2 modes)
    if (longBlock) {
      w.write(if (prevLong) 1 else 0, 1)
      w.write(if (nextLong) 1 else 0, 1)
    }
    val floorCurve = new Array[Array[Double]](channels)
    if (floor0Cfg.isDefined) {
      // floor0: bark-warped LPC -> LSP fit, coefficients quantized
      // through the delta book with cumulative error feedback, then
      // the smallest amplitude whose SHARED renderFloor0 curve keeps
      // every residue inside the lattice's coarse range
      val cfg = floor0Cfg.get
      val book = books(4)
      var ch = 0
      while (ch < channels) {
        var peak = 0.0
        var i = 0
        while (i < n2) {
          val v = math.abs(spectra(ch)(i))
          if (v > peak) peak = v
          i += 1
        }
        if (peak < 1e-10) {
          w.write(0, cfg.ampBits) // amplitude 0: unused channel
          floorCurve(ch) = null
        } else {
          val lsp = lspFit(spectra(ch), cfg)
          val idxs = new Array[Int](cfg.order)
          val data = new Array[Double](1 + cfg.order)
          var last = 0.0
          var k = 0
          while (k < cfg.order) {
            val want = math.min(lsp(k), 3.10) - last
            idxs(k) = math.max(0, math.min(63,
              math.round(want / Floor0Delta - 1.0).toInt))
            last += (idxs(k) + 1) * Floor0Delta
            data(1 + k) = last
            k += 1
          }
          // amplitude: curve_a(i) = exp(.11512925*(a*K_i - off)) with
          // K_i = off/(ampDiv*den_i) recovered from the a=1 curve.
          // One global amplitude can't put every residue in the
          // lattice's sweet spot (the LSP curve's dynamic range is not
          // the spectrum's), so search ALL amplitudes for the one
          // minimizing the PREDICTED quantized spectral error —
          // threshold-to-silence and clip included.
          data(0) = 1.0
          val c1 = renderFloor0(cfg, data, n2)
          val kArr = new Array[Double](n2)
          i = 0
          while (i < n2) {
            kArr(i) = math.log(c1(i)) / 0.11512925 + cfg.ampOffset
            i += 1
          }
          // Long shift then cap at 63: (1 << 40) wraps in Int, and the
          // exhaustive search stays bounded for any header-legal width
          val aMax = math.min((1L << math.min(cfg.ampBits, 62)) - 1, 63L)
            .toInt
          var amp = 1
          var bestErr = Double.MaxValue
          var a = 1
          while (a <= aMax) {
            var e = 0.0
            i = 0
            while (i < n2) {
              val cv = math.exp(math.min(700.0,
                0.11512925 * (a * kArr(i) - cfg.ampOffset)))
              val s = spectra(ch)(i)
              val r = s / cv
              val rq =
                if (math.abs(r) < 0.03125) 0.0
                else {
                  val q0 = math.max(-7, math.min(7, math.round(r / 0.5).toInt))
                  val q1 = math.max(-7, math.min(7,
                    math.round((r - q0 * 0.5) / 0.0625).toInt))
                  q0 * 0.5 + q1 * 0.0625
                }
              val d = rq * cv - s
              e += d * d
              i += 1
            }
            if (e < bestErr) { bestErr = e; amp = a }
            a += 1
          }
          w.write(amp, cfg.ampBits)
          w.write(0, ilog(cfg.bookList.length)) // book number 0
          k = 0
          while (k < cfg.order) {
            w.writeCode(book.codes(idxs(k)), book.lengths(idxs(k)))
            k += 1
          }
          data(0) = amp.toDouble
          floorCurve(ch) = renderFloor0(cfg, data, n2)
        }
        ch += 1
      }
      return audioPacketResidues(w, books, spectra, floorCurve,
        resType, coupled, submaps, resBegin)
    }
    // floor1: a real envelope fit over the fixture X grid, coded
    // through the prediction-inverse so the decoder reconstructs the
    // exact same Y points; the curve itself comes from the SHARED
    // renderFloor1, so encoder and decoder divide/multiply by
    // identical per-bin values
    val floorCfg = fixtureFloor()
    val floorBook = books(3)
    val range = 256
    var ch = 0
    while (ch < channels) {
      var peak = 0.0
      var i = 0
      while (i < n2) {
        val a = math.abs(spectra(ch)(i))
        if (a > peak) peak = a
        i += 1
      }
      if (peak < 1e-10) {
        w.write(0, 1) // unaudible channel
        floorCurve(ch) = null
      } else {
        // desired quantized level per X point: max magnitude over the
        // FULL spans to both sorted neighbors — then any bin between
        // two points is <= min of their levels, so the dB-interpolated
        // line never dips below the spectrum and residues stay in the
        // lattice range (|r| <= 1)
        val nv = floorCfg.xList.length
        val desired = new Array[Int](nv)
        var k = 0
        while (k < nv) {
          val j = floorCfg.sortOrder(k)
          val loX =
            if (k == 0) 0
            else floorCfg.xList(floorCfg.sortOrder(k - 1))
          val hiX =
            if (k == nv - 1) Int.MaxValue
            else floorCfg.xList(floorCfg.sortOrder(k + 1))
          var level = 0.0
          var b = math.max(0, loX)
          val bEnd = math.min(n2, hiX)
          while (b < bEnd) {
            val a = math.abs(spectra(ch)(b))
            if (a > level) level = a
            b += 1
          }
          if (level <= 0) level = peak * 1e-7
          desired(j) = math.max(0, math.min(range - 1,
            255 + math.round(
              math.log10(level) * 20.0 * 256.0 / 140.0).toInt))
          k += 1
        }
        // prediction-inverse coding: vals reproduce desired exactly
        val vals = new Array[Int](nv)
        vals(0) = desired(0)
        vals(1) = desired(1)
        var p = 2
        while (p < nv) {
          var lo = 0; var hi = 1
          var j = 0
          while (j < p) {
            val xj = floorCfg.xList(j)
            if (xj < floorCfg.xList(p) && xj > floorCfg.xList(lo)) lo = j
            if (xj > floorCfg.xList(p) && xj < floorCfg.xList(hi)) hi = j
            j += 1
          }
          val predicted = renderPoint(floorCfg.xList(lo), desired(lo),
            floorCfg.xList(hi), desired(hi), floorCfg.xList(p))
          vals(p) = floorValFor(desired(p), predicted, range)
          p += 1
        }
        w.write(1, 1)
        w.write(vals(0), 8) // Y[0]
        w.write(vals(1), 8) // Y[1]
        p = 2
        while (p < nv) {
          w.writeCode(floorBook.codes(vals(p)), floorBook.lengths(vals(p)))
          p += 1
        }
        floorCurve(ch) = renderFloor1(floorCfg, vals, n2)
      }
      ch += 1
    }
    audioPacketResidues(w, books, spectra, floorCurve, resType, coupled,
      submaps, resBegin)
  }

  /** The residue half of an audio packet, shared by the floor1 and
    * floor0 encode paths: floor-normalized residues, the coupling
    * FORWARD transform, one residue block per submap.
    */
  private def audioPacketResidues(w: BitWriter, books: Array[Codebook],
      spectra: Array[Array[Double]], floorCurve: Array[Array[Double]],
      resType: Int, coupled: Boolean, submaps: Int,
      resBegin: Int): Array[Byte] = {
    val channels = spectra.length
    val n2 = spectra(0).length
    var silent = true
    var ch = 0
    while (ch < channels) { if (floorCurve(ch) != null) silent = false; ch += 1 }
    if (silent) return w.toBytes // residue skipped: all do-not-decode
    // floor-normalized residues, then the coupling FORWARD transform
    // (derived as the left inverse of spec 4.3.5's pseudocode)
    val res = Array.tabulate(channels) { c =>
      Array.tabulate(n2)(i =>
        if (floorCurve(c) != null) spectra(c)(i) / floorCurve(c)(i)
        else 0.0)
    }
    if (coupled && channels == 2) {
      var i = 0
      while (i < n2) {
        val x = res(0)(i); val y = res(1)(i)
        if (x > 0) {
          if (y < x) { res(0)(i) = x; res(1)(i) = x - y }
          else { res(0)(i) = y; res(1)(i) = x - y }
        } else {
          if (y > x) { res(0)(i) = x; res(1)(i) = y - x }
          else { res(0)(i) = y; res(1)(i) = y - x }
        }
        i += 1
      }
    }
    // the decoder-side do-not-decode flags (after the coupling rescue)
    val dnd = Array.tabulate(channels)(floorCurve(_) == null)
    if (coupled && channels == 2 && (!dnd(0) || !dnd(1))) {
      dnd(0) = false; dnd(1) = false
    }
    // one residue block per submap, channels routed by mux = ch % submaps
    var sm = 0
    while (sm < submaps) {
      val chIdx = (0 until channels).filter(_ % submaps == sm)
      if (resType == 2) {
        if (!chIdx.forall(dnd(_))) { // all-silent submap: decoder skips
          val v = new Array[Double](chIdx.length * n2)
          var i = 0
          while (i < n2) {
            var c = 0
            while (c < chIdx.length) {
              v(i * chIdx.length + c) = res(chIdx(c))(i)
              c += 1
            }
            i += 1
          }
          emitResidue(w, books, Array(v), Array(false),
            format1 = true, resBegin)
        }
      } else {
        emitResidue(w, books, chIdx.map(res(_)).toArray,
          chIdx.map(dnd(_)).toArray, format1 = resType == 1, resBegin)
      }
      sm += 1
    }
    w.toBytes
  }

  /** Emit residue vectors in EXACTLY [[decodeResidueInner]]'s read
    * order: pass-0 classwords interleave with that group's values,
    * channels interleave inside each partition.
    */
  private def emitResidue(w: BitWriter, books: Array[Codebook],
      vectors: Array[Array[Double]], dnd: Array[Boolean],
      format1: Boolean, resBegin: Int = 0): Unit = {
    val size = vectors(0).length
    val limitBegin = math.min(resBegin, size)
    val limitEnd = math.min(1024, size)
    val partitions = math.max(0, limitEnd - limitBegin) / 64
    if (partitions == 0) return
    val ch = vectors.length
    val classes = Array.tabulate(ch, partitions) { (c, p) =>
      var any = false
      var j = limitBegin + p * 64
      while (j < limitBegin + p * 64 + 64) {
        if (math.abs(vectors(c)(j)) >= 0.03125) any = true
        j += 1
      }
      if (any && !dnd(c)) 1 else 0
    }
    val classBook = books(0)
    val coarse = books(1)
    val fine = books(2)
    var pass = 0
    while (pass < 2) {
      var pc = 0
      while (pc < partitions) {
        if (pass == 0) {
          var c = 0
          while (c < ch) {
            if (!dnd(c)) {
              val c0 = classes(c)(pc)
              val c1 = if (pc + 1 < partitions) classes(c)(pc + 1) else 0
              val entry = c0 * 2 + c1
              w.writeCode(classBook.codes(entry), classBook.lengths(entry))
            }
            c += 1
          }
        }
        var k = 0
        while (k < 2 && pc < partitions) {
          var c = 0
          while (c < ch) {
            if (!dnd(c) && classes(c)(pc) == 1) {
              val book = if (pass == 0) coarse else fine
              val off = limitBegin + pc * 64
              if (format1) {
                var j = off
                while (j < off + 64) {
                  emitPair(w, book, pass, vectors(c)(j), vectors(c)(j + 1))
                  j += 2
                }
              } else { // format 0: strided by step = 64 / dim = 32
                var j = 0
                while (j < 32) {
                  emitPair(w, book, pass, vectors(c)(off + j),
                    vectors(c)(off + j + 32))
                  j += 1
                }
              }
            }
            c += 1
          }
          pc += 1
          k += 1
        }
      }
      pass += 1
    }
  }

  private def emitPair(w: BitWriter, book: Codebook, pass: Int,
      va: Double, vb: Double): Unit = {
    val (a0, a1) = quantize(va)
    val (b0, b1) = quantize(vb)
    val (qa, qb) = if (pass == 0) (a0, b0) else (a1, b1)
    // lookup 2 lays dims out explicitly as (e/15, e%15); lookup 1
    // decodes dim d from (e / 15^d) % 15, so dim 0 is e%15
    val entry =
      if (book.lookupType == 1) (qb + 7) * 15 + (qa + 7)
      else (qa + 7) * 15 + (qb + 7)
    w.writeCode(book.codes(entry), book.lengths(entry))
  }

  /** Wrap packets into an Ogg physical stream with correct lacing,
    * granules and page CRCs. Shared with the Ogg-FLAC fixture writer.
    */
  private[ext] def oggWrap(packets: Seq[(Array[Byte], Long)],
      serial0: Int = 0x67726166): Array[Byte] = { // default: "graf"
    // group packets into pages of at most 255 lacing segments
    val out = new java.io.ByteArrayOutputStream()
    val serial = serial0.toLong & 0xffffffffL
    var pageSeq = 0
    // page boundaries: id header alone (BOS), then greedy fill
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[Vector[(Array[Byte], Long)]]
    var cur = Vector.empty[(Array[Byte], Long)]
    var curSegs = 0
    packets.zipWithIndex.foreach { case (pk, idx) =>
      val segs = pk._1.length / 255 + 1
      require(segs <= 255, s"fixture packet too large: ${pk._1.length}")
      // spec page layout: the id header alone on the BOS page, the
      // setup header's page closed before audio begins
      if (idx == 1 || idx == 3 || (curSegs + segs > 255 && cur.nonEmpty)) {
        groups += cur; cur = Vector.empty; curSegs = 0
      }
      cur = cur :+ pk
      curSegs += segs
    }
    if (cur.nonEmpty) groups += cur
    groups.zipWithIndex.foreach { case (g, gi) =>
      val flags =
        (if (gi == 0) 2 else 0) | (if (gi == groups.length - 1) 4 else 0)
      val granule = g.last._2
      val laces = g.flatMap { case (pk, _) =>
        val full = pk.length / 255
        Seq.fill(full)(255) :+ (pk.length % 255)
      }
      val payload = g.map(_._1)
      val header = java.nio.ByteBuffer
        .allocate(27 + laces.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      header.put("OggS".getBytes("US-ASCII"))
        .put(0.toByte).put(flags.toByte)
        .putLong(granule).putInt(serial.toInt).putInt(pageSeq)
        .putInt(0) // CRC placeholder (filled below)
        .put(laces.length.toByte)
      laces.foreach(l => header.put(l.toByte))
      val page = header.array() ++ payload.flatten
      val crc = oggCrc(page, 0, page.length)
      page(22) = (crc & 0xff).toByte
      page(23) = ((crc >> 8) & 0xff).toByte
      page(24) = ((crc >> 16) & 0xff).toByte
      page(25) = ((crc >> 24) & 0xff).toByte
      out.write(page)
      pageSeq += 1
    }
    out.toByteArray
  }

  /** Encode PCM ([-1,1], mono or L/R-interleaved stereo) as a real
    * Ogg-Vorbis stream — the [[Mp3.encode]] analog. Long blocks
    * (1024) by default; `forceShort` uses 256-sample blocks
    * throughout (exercising the short-mode decode path); the
    * private[ext] schedule form drives long/short TRANSITIONS for the
    * window-slope tests.
    */
  def encode(pcm: Array[Double], rate: Int, channels: Int = 1,
      forceShort: Boolean = false,
      comments: Seq[(String, String)] = Nil,
      floor0: Boolean = false): Array[Byte] = {
    val L = pcm.length / channels
    val n = if (forceShort) ShortBlock else LongBlock
    val frames = math.max(2, (2 * L + n - 1) / n + 1)
    encodeSchedule(pcm, rate, channels, Seq.fill(frames)(!forceShort),
      comments = comments, floor0 = floor0)
  }

  /** Encode with an explicit per-frame long/short schedule, residue
    * format (0/1/2) and optional square-polar stereo coupling — the
    * knobs that route round trips through every decoder path.
    */
  private[ext] def encodeSchedule(pcm: Array[Double], rate: Int,
      channels: Int, schedule: Seq[Boolean], resType: Int = 2,
      coupled: Boolean = false, floor0: Boolean = false,
      submaps: Int = 1,
      comments: Seq[(String, String)] = Nil,
      resBegin: Int = 0, lookup1Books: Boolean = false,
      floor0Cfg: Option[Floor0] = None): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels $channels")
    require(rate > 0 && schedule.nonEmpty, "encode args")
    require(resType >= 0 && resType <= 2 && (!coupled || channels == 2),
      s"resType $resType coupled $coupled")
    require(submaps == 1 || (submaps == 2 && channels == 2 && !coupled),
      s"submaps $submaps") // coupled channels must share a submap
    // floor0Cfg overrides the fixture header — the hostile-floor0 test
    // hook (the emitted stream must still assemble without crashing)
    val f0cfg = floor0Cfg.orElse(
      if (floor0) Some(fixtureFloor0(rate)) else None)
    val books = fixtureBooks(lookup1Books, f0cfg.isDefined)
    val L = pcm.length / channels
    def in(ch: Int, t: Long): Double =
      if (t < 0 || t >= L) 0.0 else pcm(t.toInt * channels + ch)
    val packets = scala.collection.mutable.ArrayBuffer
      .empty[(Array[Byte], Long)]
    packets += ((idHeaderPacket(channels, rate), 0L))
    packets += ((commentPacket(comments), 0L))
    packets += ((setupPacket(books, resType, coupled, f0cfg,
      submaps, resBegin), 0L))
    // extend the schedule with long frames until the frame centers
    // span the whole input (decoded output = last center - first)
    val sizes = scala.collection.mutable.ArrayBuffer(
      schedule.map(l => if (l) LongBlock else ShortBlock): _*)
    def span: Long = sizes.iterator.sliding(2).withPartial(false)
      .map(p => (p.head / 4 + p(1) / 4).toLong).sum
    while (span < L) sizes += LongBlock
    var center = sizes.head / 2L
    val c0 = center
    var f = 0
    while (f < sizes.length) {
      val nf = sizes(f)
      val prevLong = f == 0 || sizes(f - 1) == LongBlock
      val nextLong = f + 1 >= sizes.length || sizes(f + 1) == LongBlock
      val leftSlope =
        if (nf == LongBlock && !prevLong) ShortBlock / 2 else nf / 2
      val rightSlope =
        if (nf == LongBlock && !nextLong) ShortBlock / 2 else nf / 2
      val w = window(nf, leftSlope, rightSlope)
      val start = center - nf / 2
      val spectra = Array.tabulate(channels) { ch =>
        val s = new Array[Double](nf)
        var j = 0
        while (j < nf) {
          s(j) = in(ch, start + j - c0) * w(j)
          j += 1
        }
        mdct(s)
      }
      val pk = audioPacket(books, spectra, nf == LongBlock,
        prevLong, nextLong, resType, coupled, submaps, resBegin, f0cfg)
      // granule = output decodable after this packet = frames' center
      // span so far, capped at the true input length on the last one
      val granule = math.min(center - c0, L.toLong)
      packets += ((pk, granule))
      if (f + 1 < sizes.length) center += nf / 4 + sizes(f + 1) / 4
      f += 1
    }
    // chained physical streams need DISTINCT serials (Ogg spec), so
    // derive one deterministically from the content
    var serial = 0x67726166 ^ (rate * 2654435761L).toInt ^
      (pcm.length * 40503) ^ (channels << 28)
    if (serial == 0) serial = 1
    oggWrap(packets.toSeq, serial)
  }
}
