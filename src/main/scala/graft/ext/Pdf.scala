package graft.ext

/** [EXT] PDF text extraction — the dominant long-form-document format
  * in any web crawl, implemented from the public PDF spec (ISO 32000)
  * with zero transcribed tables:
  *
  *  - OBJECT LAYER: a linear scan for `N G obj` markers instead of the
  *    xref table — the spec's own damaged-file reconstruction route,
  *    robust to broken/absent xrefs and incremental updates (later
  *    definitions of the same object number win, matching update
  *    semantics). Object streams (/Type/ObjStm, PDF 1.5 compressed
  *    object containers) are expanded after the scan.
  *  - FILTERS: FlateDecode via the JDK Inflater, LZWDecode (the PDF
  *    MSB-first 9..12-bit variant with /EarlyChange both ways — pure
  *    algorithm, no tables), ASCIIHexDecode and ASCII85Decode, and
  *    the full predictor family (/Predictor 2 TIFF differencing and
  *    10-15 PNG row filters — the same five reconstructions as the
  *    PNG pixel path) [r15; LZW + predictors previously refused].
  *    DCTDecode/CCITT/JBIG2/JPX/crypt REFUSE into the fidelity
  *    counter rather than risking a fabricated decode.
  *  - TEXT LAYER: the page tree (/Catalog -> /Pages -> /Page with
  *    /Resources inheritance), content-stream tokenization, and the
  *    text operators (BT/ET, Tf, Td/TD/Tm/TL, T-star, Tj/TJ and the
  *    two quote forms) with the standard newline (vertical movement)
  *    and TJ-kerning space heuristics.
  *  - ENCODINGS, the honest-boundary design: /WinAnsiEncoding IS
  *    windows-1252 and /MacRomanEncoding IS x-MacRoman — both JDK
  *    platform charsets, so no code-point table is transcribed;
  *    /ToUnicode CMaps (bfchar/bfrange) give exact mappings for
  *    embedded and composite (Type0/Identity-H two-byte) fonts;
  *    /Differences arrays resolve through uniXXXX names plus the
  *    unambiguous tiny-AGL subset (letters as themselves, `zero`..
  *    `nine`, `space`/`period`/`comma`/`hyphen`/`colon`/`semicolon`).
  *    EVERY unmapped byte increments the per-document `refused`
  *    counter — the datasheet number that keeps the boundary measured
  *    instead of silent (the mp3Coverage discipline).
  *
  * Scale shape: [[table]] is one batched map over the media column —
  * rows per page, no shuffle, no driver collect.
  */
object Pdf {

  // ------------------------------------------------------------------
  // Object model + lexer
  // ------------------------------------------------------------------

  private sealed trait Obj
  private case class PNum(v: Double) extends Obj
  private case class PName(v: String) extends Obj
  private case class PStr(v: Array[Byte]) extends Obj
  private case class PArr(v: Vector[Obj]) extends Obj
  private case class PDict(v: Map[String, Obj]) extends Obj
  private case class PRef(num: Int, gen: Int) extends Obj
  private case class PBool(v: Boolean) extends Obj
  private case object PNull extends Obj
  private case class PStream(dict: PDict, raw: Array[Byte]) extends Obj

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  /** Recursive-descent PDF value lexer over a byte window. Container
    * recursion is depth-capped: a wild file nesting thousands of
    * `[`/`<<` would StackOverflow PAST the NonFatal catch (an Error,
    * not an Exception) — past the cap the lexer consumes bytes as
    * PNull and the document degrades instead of killing the executor.
    */
  private final class Lexer(b: Array[Byte], var pos: Int, val end: Int) {
    private var depth = 0
    def skipWs(): Unit = {
      var run = true
      while (run && pos < end) {
        val c = b(pos) & 0xff
        if (isWs(c)) pos += 1
        else if (c == '%') { // comment to EOL
          while (pos < end && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else run = false
      }
    }

    def peekKeyword(k: String): Boolean =
      pos + k.length <= end &&
        (0 until k.length).forall(i => b(pos + i) == k.charAt(i))

    def token(): String = { // bare keyword/number token
      skipWs()
      val s = pos
      while (pos < end && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff))
        pos += 1
      new String(b, s, pos - s, "ISO-8859-1")
    }

    def value(): Obj = {
      skipWs()
      if (pos >= end) return PNull
      val c = b(pos) & 0xff
      if (c == '/') {
        pos += 1
        val s = pos
        while (pos < end && !isWs(b(pos) & 0xff) && !isDelim(b(pos) & 0xff))
          pos += 1
        PName(decodeName(new String(b, s, pos - s, "ISO-8859-1")))
      } else if (c == '(') {
        pos += 1
        literalString()
      } else if (c == '<') {
        if (pos + 1 < end && b(pos + 1) == '<') {
          pos += 2
          if (depth >= 128) { pos = end; PNull }
          else { depth += 1; val d = dict(); depth -= 1; d }
        } else { pos += 1; hexString() }
      } else if (c == '[') {
        pos += 1
        if (depth >= 128) { pos = end; return PNull }
        depth += 1
        val items = Vector.newBuilder[Obj]
        skipWs()
        while (pos < end && b(pos) != ']') {
          items += value()
          skipWs()
        }
        if (pos < end) pos += 1 // ]
        depth -= 1
        PArr(items.result())
      } else if (c == ']' || c == '>' || c == ')' || c == '}' ||
        c == '{') {
        // stray close — or a type-4-function brace — consumed so the
        // enclosing array/dict loop always makes progress (an
        // unconsumed '{' would spin value() forever: a one-byte DoS)
        pos += 1
        PNull
      } else {
        val t = token()
        if (t == "true") PBool(true)
        else if (t == "false") PBool(false)
        else if (t == "null" || t.isEmpty) PNull
        else {
          // number — possibly the start of "N G R"
          val n = t.toDoubleOption.getOrElse(return PNull)
          val save = pos
          skipWs()
          val save2 = pos
          val t2 = token()
          if (t2.nonEmpty && t2.forall(_.isDigit)) {
            skipWs()
            val t3 = token()
            if (t3 == "R" && n >= 0 && n == n.toInt)
              return PRef(n.toInt, t2.toInt)
          }
          pos = save
          // restore precisely: token() above may have eaten delims? no
          // — token() stops at delims; save is right after the number
          val _ = save2
          PNum(n)
        }
      }
    }

    private def decodeName(s: String): String = {
      if (!s.contains('#')) return s
      val out = new StringBuilder
      var i = 0
      while (i < s.length) {
        // '#' not followed by two hex digits stays literal — a single
        // malformed name must never abort the whole document
        val hex = i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0
        if (s.charAt(i) == '#' && hex) {
          out += Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar
          i += 3
        } else { out += s.charAt(i); i += 1 }
      }
      out.toString
    }

    private def literalString(): PStr = {
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < end && depth > 0) {
        val c = b(pos) & 0xff
        pos += 1
        if (c == '\\' && pos < end) {
          val e = b(pos) & 0xff
          pos += 1
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => if (pos < end && b(pos) == '\n') pos += 1 // \EOL
            case '\n' => ()
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && pos < end && b(pos) >= '0' && b(pos) <= '7') {
                v = v * 8 + (b(pos) - '0')
                pos += 1
                k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other)
          }
        } else if (c == '(') { depth += 1; out.write(c) }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c) }
        else out.write(c)
      }
      PStr(out.toByteArray)
    }

    private def hexString(): PStr = {
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (pos < end && b(pos) != '>') {
        val c = Character.digit(b(pos) & 0xff, 16)
        if (c >= 0) {
          if (hi < 0) hi = c
          else { out.write((hi << 4) | c); hi = -1 }
        }
        pos += 1
      }
      if (hi >= 0) out.write(hi << 4) // odd count: trailing 0 per spec
      if (pos < end) pos += 1 // >
      PStr(out.toByteArray)
    }

    private def dict(): Obj = {
      val m = Map.newBuilder[String, Obj]
      skipWs()
      while (pos < end && !(b(pos) == '>' && pos + 1 < end &&
        b(pos + 1) == '>')) {
        value() match {
          case PName(k) => m += ((k, value()))
          case _        => () // junk key: value() already advanced
        }
        skipWs()
      }
      if (pos < end) pos += 2 // >>
      val d = PDict(m.result())
      // a `stream` keyword directly after the dict turns it into one
      skipWs()
      if (peekKeyword("stream")) {
        pos += 6
        if (pos < end && b(pos) == '\r') pos += 1
        if (pos < end && b(pos) == '\n') pos += 1
        val dataStart = pos
        // robust endstream search (the /Length may be an unresolved
        // indirect ref): the spec requires the keyword after the data
        val idx = indexOf(b, "endstream", dataStart, end)
        if (idx < 0) return d
        var de = idx
        while (de > dataStart && (b(de - 1) == '\n' || b(de - 1) == '\r'))
          de -= 1
        pos = idx + 9
        return PStream(d, java.util.Arrays.copyOfRange(b, dataStart, de))
      }
      d
    }
  }

  private def indexOf(b: Array[Byte], s: String, from: Int,
      end: Int): Int = {
    val pat = s.getBytes("ISO-8859-1")
    var i = math.max(0, from)
    val last = end - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  // ------------------------------------------------------------------
  // Document scan + filters
  // ------------------------------------------------------------------

  /** All indirect objects by linear `N G obj` scan; later definitions
    * win (incremental-update semantics). Object streams expand after
    * the scan so their contents participate too.
    */
  private def scanObjects(b: Array[Byte]): Map[Int, Obj] = {
    // track each definition's FILE OFFSET: "later wins" must hold
    // between top-level objects AND objects packed into a later
    // incremental-update ObjStm (an Acrobat re-save stores the edited
    // object inside a compressed stream appended after the original)
    val out = scala.collection.mutable.Map.empty[Int, (Int, Obj)]
    var i = 0
    while (i >= 0 && i < b.length) {
      val idx = indexOf(b, "obj", i, b.length)
      if (idx < 0) { i = -1 }
      else {
        // back-parse " G N" before the keyword
        var p = idx - 1
        while (p >= 0 && isWs(b(p) & 0xff)) p -= 1
        val genEnd = p + 1
        while (p >= 0 && (b(p) & 0xff).toChar.isDigit) p -= 1
        val genStart = p + 1
        while (p >= 0 && isWs(b(p) & 0xff)) p -= 1
        val numEnd = p + 1
        while (p >= 0 && (b(p) & 0xff).toChar.isDigit) p -= 1
        val numStart = p + 1
        if (genEnd > genStart && numEnd > numStart &&
          genEnd - genStart <= 5 && numEnd - numStart <= 9 &&
          (p < 0 || isWs(b(p) & 0xff) || isDelim(b(p) & 0xff))) {
          val num = new String(b, numStart, numEnd - numStart,
            "ISO-8859-1").toInt
          val lex = new Lexer(b, idx + 3, b.length)
          out(num) = ((idx, lex.value()))
          i = lex.pos
        } else i = idx + 3
      }
    }
    // expand object streams: decoded payload = N (objnum, offset)
    // pairs, then the objects themselves relative to /First; a packed
    // object overrides an earlier-in-file definition
    val objStms = out.collect {
      case (_, (at, s @ PStream(d, _)))
        if d.v.get("Type").contains(PName("ObjStm")) => (at, s)
    }.toSeq
    objStms.foreach { case (stmAt, s) =>
      decodeStream(s, out.map { case (k, (_, v)) => (k, v) }.toMap)
        .foreach { data =>
          (s.dict.v.get("N"), s.dict.v.get("First")) match {
            case (Some(PNum(n)), Some(PNum(first)))
              if n > 0 && n < 65536 =>
              val hdr = new Lexer(data, 0,
                math.min(data.length, first.toInt))
              val pairs = (0 until n.toInt).flatMap { _ =>
                (hdr.value(), hdr.value()) match {
                  case (PNum(num), PNum(off)) =>
                    Some((num.toInt, off.toInt))
                  case _ => None
                }
              }
              pairs.foreach { case (num, off) =>
                val at = first.toInt + off
                val older = out.get(num).forall(_._1 < stmAt)
                if (at >= 0 && at < data.length && older)
                  out(num) =
                    ((stmAt, new Lexer(data, at, data.length).value()))
              }
            case _ => ()
          }
        }
    }
    out.map { case (k, (_, v)) => (k, v) }.toMap
  }

  /** Apply the stream's filter chain. None = a filter outside the
    * implemented surface (DCT, CCITT, JBIG2, JPX, crypt — the
    * fabrication-risk holds), a corrupt stream, or unsupported
    * predictor geometry — the caller counts it as refused content
    * rather than guessing. FlateDecode (JDK Inflater), LZWDecode
    * (PDF variant: 9..12-bit MSB-first codes, 256 clear / 257 EOD,
    * /EarlyChange both settings), ASCIIHex/ASCII85, and the full
    * predictor family (TIFF /Predictor 2 horizontal differencing and
    * the five PNG row filters, /Predictor 10-15) all decode —
    * per-filter /DecodeParms in both the single-dict and the aligned
    * array form.
    */
  private def decodeStream(s: PStream, objs: Map[Int, Obj])
      : Option[Array[Byte]] = {
    def resolve(o: Obj): Obj = o match {
      case PRef(n, _) => objs.getOrElse(n, PNull)
      case x          => x
    }
    val filters: Seq[String] = resolve(s.dict.v.getOrElse("Filter", PNull)) match {
      case PName(f)  => Seq(f)
      case PArr(fs)  => fs.map(resolve).collect { case PName(f) => f }
      case _         => Nil
    }
    // /DecodeParms may be a dict OR an array of per-filter dicts (the
    // spec's required form when /Filter is an array) — align by index
    val parms: Seq[Obj] =
      resolve(s.dict.v.getOrElse("DecodeParms",
        s.dict.v.getOrElse("DP", PNull))) match {
        case PArr(items) => items.map(resolve)
        case PNull       => Nil
        case other       => Seq(other)
      }
    var data = s.raw
    for ((f, fi) <- filters.zipWithIndex) {
      val pm: Map[String, Obj] = parms.lift(fi).map(resolve) match {
        case Some(PDict(m)) => m
        case _              => Map.empty
      }
      def num(k: String, dflt: Int): Int =
        resolve(pm.getOrElse(k, PNull)) match {
          case PNum(v) => v.toInt
          case _       => dflt
        }
      f match {
        case "FlateDecode" | "Fl" =>
          data = inflate(data).getOrElse(return None)
        case "LZWDecode" | "LZW" =>
          data = lzwDecode(data, num("EarlyChange", 1) != 0)
            .getOrElse(return None)
        case "ASCIIHexDecode" | "AHx" =>
          val out = new java.io.ByteArrayOutputStream()
          var hi = -1
          var stop = false
          data.foreach { c =>
            if (!stop) {
              if (c == '>') stop = true
              else {
                val d = Character.digit(c & 0xff, 16)
                if (d >= 0) {
                  if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
                }
              }
            }
          }
          if (hi >= 0) out.write(hi << 4)
          data = out.toByteArray
        case "ASCII85Decode" | "A85" =>
          data = ascii85(data).getOrElse(return None)
        case _ => return None // DCT/CCITT/JBIG2/crypt: refuse, never guess
      }
      // the predictor is an LZW/Flate parameter and applies to the
      // DECOMPRESSED bytes (ISO 32000 7.4.4.4)
      if (f == "FlateDecode" || f == "Fl" || f == "LZWDecode" ||
        f == "LZW") {
        val pred = num("Predictor", 1)
        if (pred > 1)
          data = unpredict(data, pred, num("Colors", 1),
            num("BitsPerComponent", 8), num("Columns", 1))
            .getOrElse(return None)
      }
    }
    Some(data)
  }

  /** PDF LZWDecode (ISO 32000 7.4.4): MSB-first variable-width codes
    * starting at 9 bits, growing to 12 as the table fills — one code
    * EARLY when /EarlyChange is 1 (the default) — code 256 clears the
    * table, 257 is EOD. Structurally the GIF decoder at
    * [[Multimodal.ContainerCodec]] with the bit order flipped and the
    * fixed 258-entry base table; output is byte-capped so a crafted
    * few-KB stream can't balloon the heap. None on any structural
    * violation — conservative, like every other decode path here.
    */
  private[ext] def lzwDecode(d: Array[Byte],
      earlyChange: Boolean): Option[Array[Byte]] = try {
    val Clear = 256
    val Eod = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, math.min(d.length * 4, 1 << 20)))
    val early = if (earlyChange) 1 else 0
    var dictSize = 258
    var w = 9
    var bitPos = 0
    var prev = -1
    val totalBits = d.length * 8
    var done = false
    while (!done && bitPos + w <= totalBits) {
      var code = 0
      var i = 0
      while (i < w) {
        val p = bitPos + i
        code = (code << 1) | ((d(p >> 3) >> (7 - (p & 7))) & 1)
        i += 1
      }
      bitPos += w
      if (code == Clear) { dictSize = 258; w = 9; prev = -1 }
      else if (code == Eod) done = true
      else {
        val isNew = code >= dictSize
        if (isNew && (code != dictSize || prev < 0)) return None
        var c = if (isNew) prev else code
        var sp = 0
        while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= 256) return None // clear/EOD can never head a chain
        val first = c.toByte
        out.write(first)
        var j = sp - 1
        while (j >= 0) { out.write(stack(j)); j -= 1 }
        if (isNew) out.write(first)
        if (out.size > (1 << 26)) return None // expansion bomb guard
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first
          dictSize += 1
        }
        if (dictSize + early >= (1 << w) && w < 12) w += 1
        prev = code
      }
    }
    if (out.size == 0) None else Some(out.toByteArray)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Undo an LZW/Flate predictor (ISO 32000 7.4.4.4). /Predictor 2 is
    * TIFF horizontal differencing (8-bit components — the wild norm;
    * sub-byte/16-bit differencing refuses into the fidelity counter);
    * 10-15 are the PNG row filters: each row is one filter-type byte
    * plus the packed row, undone with the same five reconstructions
    * as the PNG pixel path (None/Sub/Up/Average/Paeth). Truncated or
    * misaligned data refuses — never a shifted reconstruction.
    */
  private def unpredict(data: Array[Byte], predictor: Int, colors: Int,
      bpc: Int, columns: Int): Option[Array[Byte]] = {
    if (colors < 1 || colors > 64 || columns < 1 ||
      columns > (1 << 24)) return None
    if (predictor == 2) {
      if (bpc != 8) return None
      val rowLen = colors * columns // <= 2^30 under the bounds above
      if (rowLen > data.length || data.length % rowLen != 0) return None
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        var i = colors
        while (i < rowLen) {
          out(r + i) = ((out(r + i) + out(r + i - colors)) & 0xff).toByte
          i += 1
        }
        r += rowLen
      }
      Some(out)
    } else if (predictor >= 10 && predictor <= 15) {
      if (bpc != 1 && bpc != 2 && bpc != 4 && bpc != 8 && bpc != 16)
        return None
      // row size in LONG arithmetic: colors*bpc*columns reaches 2^34
      // under the bounds above — an Int wrap here would pass the
      // alignment check with SHIFTED row geometry (review find r15).
      // A real stream holds >= 1 full row, so rb+1 > data.length
      // refuses; the explicit cap also bounds the Int scratch rows.
      val bitsPerPx = colors.toLong * bpc
      val bpp = math.max(1L, (bitsPerPx + 7) / 8).toInt
      val rbL = (bitsPerPx * columns + 7) / 8
      if (rbL <= 0 || rbL > (1 << 24) || rbL + 1 > data.length ||
        data.length % (rbL + 1) != 0) return None
      val rb = rbL.toInt
      val rows = data.length / (rb + 1)
      val prev = new Array[Int](rb)
      val cur = new Array[Int](rb)
      val out = new Array[Byte](rb * rows)
      var y = 0
      while (y < rows) {
        val rowOff = y * (rb + 1)
        val fType = data(rowOff) & 0xff
        if (fType > 4) return None
        var x = 0
        while (x < rb) {
          val v = data(rowOff + 1 + x) & 0xff
          val a = if (x >= bpp) cur(x - bpp) else 0
          val u = prev(x)
          val c = if (x >= bpp) prev(x - bpp) else 0
          val recon = fType match {
            case 0 => v
            case 1 => v + a
            case 2 => v + u
            case 3 => v + ((a + u) >> 1)
            case _ =>
              val p = a + u - c
              val pa = math.abs(p - a); val pb = math.abs(p - u)
              val pc = math.abs(p - c)
              v + (if (pa <= pb && pa <= pc) a
                else if (pb <= pc) u else c)
          }
          cur(x) = recon & 0xff
          out(y * rb + x) = cur(x).toByte
          x += 1
        }
        System.arraycopy(cur, 0, prev, 0, rb)
        y += 1
      }
      Some(out)
    } else None
  }

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] = try {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](8192)
    var guard = 0
    while (!inf.finished() && guard < (1 << 16)) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (inf.needsInput() || inf.needsDictionary()) guard = 1 << 16
      guard += 1
    }
    inf.end()
    if (out.size() == 0) None else Some(out.toByteArray)
  } catch { case scala.util.control.NonFatal(_) => None }

  private def ascii85(raw: Array[Byte]): Option[Array[Byte]] = try {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var n = 0
    var i = 0
    var done = false
    while (i < raw.length && !done) {
      val c = raw(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && n == 0) out.write(Array[Byte](0, 0, 0, 0))
      else if (c >= '!' && c <= 'u') {
        acc = acc * 85 + (c - '!')
        n += 1
        if (n == 5) {
          out.write(((acc >> 24) & 0xff).toInt)
          out.write(((acc >> 16) & 0xff).toInt)
          out.write(((acc >> 8) & 0xff).toInt)
          out.write((acc & 0xff).toInt)
          acc = 0; n = 0
        }
      }
      i += 1
    }
    if (n > 0) { // partial group: pad with 'u', emit n-1 bytes
      var k = n
      while (k < 5) { acc = acc * 85 + 84; k += 1 }
      val bytes = Array(((acc >> 24) & 0xff).toByte,
        ((acc >> 16) & 0xff).toByte, ((acc >> 8) & 0xff).toByte)
      out.write(bytes, 0, n - 1)
    }
    Some(out.toByteArray)
  } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------
  // Fonts + encodings
  // ------------------------------------------------------------------

  /** Per-font decode state: 2-byte composite flag, ToUnicode map
    * (code -> string), simple-font charset, /Differences overrides.
    */
  private final case class Font(
      twoByte: Boolean,
      toUnicode: Map[Int, String],
      charset: java.nio.charset.Charset, // null = ASCII-only fallback
      differences: Map[Int, String])

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private val MacRoman: java.nio.charset.Charset =
    try java.nio.charset.Charset.forName("x-MacRoman")
    catch { case scala.util.control.NonFatal(_) => null }

  /** The unambiguous tiny-AGL subset: single letters name themselves;
    * digit and core punctuation names are listed. Anything else
    * refuses into the fidelity counter.
    */
  private def glyphToChar(name: String): Option[String] = {
    if (name.length == 1 && name.charAt(0).isLetter) return Some(name)
    if (name.startsWith("uni") && name.length == 7)
      return try Some(Integer.parseInt(name.substring(3), 16).toChar.toString)
      catch { case _: NumberFormatException => None }
    val basics = Map(
      "space" -> " ", "period" -> ".", "comma" -> ",", "hyphen" -> "-",
      "colon" -> ":", "semicolon" -> ";", "zero" -> "0", "one" -> "1",
      "two" -> "2", "three" -> "3", "four" -> "4", "five" -> "5",
      "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9")
    basics.get(name)
  }

  /** Parse a ToUnicode CMap's bfchar/bfrange sections. Total map
    * entries are budgeted (1M — far past any real font's code space,
    * which tops out at 65536 two-byte codes): without it a few-KB
    * hostile stream of near-full bfranges forces hundreds of millions
    * of insertions before any exception can fire. Past the budget the
    * rest of the CMap is dropped; the affected codes then land in the
    * per-document `refused` counter like any unmapped code.
    */
  private def parseCMap(data: Array[Byte]): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    var budget = 1 << 20
    val lex = new Lexer(data, 0, data.length)
    def hexOf(o: Obj): Option[Array[Byte]] = o match {
      case PStr(v) => Some(v)
      case _       => None
    }
    def codeOf(v: Array[Byte]): Int =
      v.foldLeft(0)((a, x) => (a << 8) | (x & 0xff))
    def strOf(v: Array[Byte]): String = { // UTF-16BE code units
      val sb = new StringBuilder
      var i = 0
      while (i + 1 < v.length) {
        sb += (((v(i) & 0xff) << 8) | (v(i + 1) & 0xff)).toChar
        i += 2
      }
      sb.toString
    }
    var mode = 0 // 1 = bfchar, 2 = bfrange
    var pending = Vector.empty[Obj]
    while (lex.pos < data.length) {
      lex.skipWs()
      if (lex.pos >= data.length) ()
      else {
        val c = data(lex.pos) & 0xff
        if (c == '<' || c == '[') {
          pending :+= lex.value()
          if (mode == 1 && pending.length == 2) {
            for (k <- hexOf(pending(0)); v <- hexOf(pending(1)))
              if (budget > 0) { out += ((codeOf(k), strOf(v))); budget -= 1 }
            pending = Vector.empty
          } else if (mode == 2 && pending.length == 3) {
            (hexOf(pending(0)), hexOf(pending(1)), pending(2)) match {
              case (Some(lo), Some(hi), PStr(dst)) =>
                val l = codeOf(lo); val h = codeOf(hi)
                val base = strOf(dst)
                if (base.nonEmpty && h >= l && h - l < 65536) {
                  var k = l
                  while (k <= h && budget > 0) {
                    val s = base.dropRight(1) +
                      (base.last + (k - l)).toChar
                    out += ((k, s))
                    budget -= 1
                    k += 1
                  }
                }
              case (Some(lo), Some(hi), PArr(dsts)) =>
                val l = codeOf(lo); val h = codeOf(hi)
                if (h >= l && h - l < dsts.length + 1) {
                  dsts.zipWithIndex.foreach {
                    case (PStr(v), k) if l + k <= h && budget > 0 =>
                      out += ((l + k, strOf(v)))
                      budget -= 1
                    case _ => ()
                  }
                }
              case _ => ()
            }
            pending = Vector.empty
          } else if (mode == 0) pending = Vector.empty
        } else {
          val t = new Lexer(data, lex.pos, data.length)
          val tok = t.token()
          lex.pos = t.pos
          tok match {
            case "beginbfchar"  => mode = 1; pending = Vector.empty
            case "beginbfrange" => mode = 2; pending = Vector.empty
            case "endbfchar" | "endbfrange" => mode = 0
            case "" => lex.pos += 1
            case _  => ()
          }
        }
      }
    }
    out.result()
  }

  private def loadFont(d: PDict, objs: Map[Int, Obj]): Font = {
    def resolve(o: Obj): Obj = o match {
      case PRef(n, _) => objs.getOrElse(n, PNull)
      case x          => x
    }
    val subtype = resolve(d.v.getOrElse("Subtype", PNull)) match {
      case PName(s) => s
      case _        => ""
    }
    val toUni = resolve(d.v.getOrElse("ToUnicode", PNull)) match {
      case s: PStream =>
        decodeStream(s, objs).map(parseCMap).getOrElse(Map.empty)
      case _ => Map.empty[Int, String]
    }
    var charset: java.nio.charset.Charset = null
    var diffs = Map.empty[Int, String]
    resolve(d.v.getOrElse("Encoding", PNull)) match {
      case PName("WinAnsiEncoding")  => charset = Cp1252
      case PName("MacRomanEncoding") => charset = MacRoman
      case enc @ PDict(m) =>
        resolve(m.getOrElse("BaseEncoding", PNull)) match {
          case PName("WinAnsiEncoding")  => charset = Cp1252
          case PName("MacRomanEncoding") => charset = MacRoman
          case _                         => ()
        }
        resolve(m.getOrElse("Differences", PNull)) match {
          case PArr(items) =>
            var code = 0
            val b = Map.newBuilder[Int, String]
            items.foreach {
              case PNum(n) => code = n.toInt
              case PName(g) =>
                glyphToChar(g).foreach(s => b += ((code, s)))
                code += 1
              case _ => ()
            }
            diffs = b.result()
          case _ => ()
        }
        val _ = enc
      case _ => ()
    }
    Font(subtype == "Type0", toUni, charset, diffs)
  }

  // ------------------------------------------------------------------
  // Page tree + content-stream text
  // ------------------------------------------------------------------

  final case class PdfText(pages: Vector[String], refused: Long)

  /** A trailer-dictionary key (`/Root`, `/Info`), resolved the
    * damaged-file-tolerant way: keyword-scan every classic `trailer`
    * dict — the LAST one in file order carrying the key wins, matching
    * incremental-update semantics — then fall back to any
    * /Type/XRef cross-reference STREAM dict (PDF 1.5 files have no
    * trailer keyword at all).
    */
  private def trailerValue(b: Array[Byte], objs: Map[Int, Obj],
      key: String): Option[Obj] = {
    var found: Option[Obj] = None
    var at = 0
    var scanning = true
    while (scanning) {
      val idx = indexOf(b, "trailer", at, b.length)
      if (idx < 0) scanning = false
      else {
        new Lexer(b, idx + 7, b.length).value() match {
          case PDict(m) if m.contains(key) => found = m.get(key)
          case _                           => ()
        }
        at = idx + 7
      }
    }
    found.orElse(objs.values.collectFirst {
      case PStream(d, _) if d.v.get("Type").contains(PName("XRef")) &&
        d.v.contains(key) => d.v(key)
    })
  }

  def isPdf(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && b(0) == '%' && b(1) == 'P' &&
      b(2) == 'D' && b(3) == 'F' && b(4) == '-'

  def text(b: Array[Byte]): Option[PdfText] = try {
    if (!isPdf(b)) return None
    val objs = scanObjects(b)
    def resolve(o: Obj): Obj = o match {
      case PRef(n, _) => objs.getOrElse(n, PNull)
      case x          => x
    }
    // the catalog: /Root from the LAST trailer in file order (matching
    // incremental-update semantics — a re-save may write the
    // replacement catalog under a NEW object number, leaving the stale
    // one in the scan map), then the xref-stream dict, then — only when
    // neither resolves — any /Type/Catalog dict from the scan
    val catalog = trailerValue(b, objs, "Root").map(resolve).collect {
      case d @ PDict(m) if m.get("Type").contains(PName("Catalog")) => d
    }.orElse(objs.values.collectFirst {
      case d @ PDict(m) if m.get("Type").contains(PName("Catalog")) => d
    }).getOrElse(return None)
    // walk the page tree, inheriting /Resources. Cycle hardening: a
    // /Kids entry referencing an ancestor would expand exponentially
    // under the depth cap alone (e.g. `/Kids [2 0 R 2 0 R]` on object
    // 2 is 2^64 calls — a 60-byte DoS), so every visited indirect
    // object number is walked at most once, and total pages are capped.
    val pages = Vector.newBuilder[(PDict, Map[String, Obj])]
    var pageCount = 0
    val visited = scala.collection.mutable.Set.empty[Int]
    def walk(node: Obj, inherited: Map[String, Obj], depth: Int): Unit = {
      if (depth > 64 || pageCount >= 65536) return
      node match {
        case PRef(num, _) => if (!visited.add(num)) return
        case _            => ()
      }
      resolve(node) match {
        case d @ PDict(m) =>
          val res = resolve(m.getOrElse("Resources", PNull)) match {
            case PDict(r) => r
            case _        => inherited
          }
          m.get("Type") match {
            case Some(PName("Pages")) =>
              resolve(m.getOrElse("Kids", PNull)) match {
                case PArr(kids) => kids.foreach(walk(_, res, depth + 1))
                case _          => ()
              }
            case Some(PName("Page")) =>
              pages += ((d, res)); pageCount += 1
            case _ => ()
          }
        case _ => ()
      }
    }
    walk(catalog.v.getOrElse("Pages", PNull), Map.empty, 0)
    val pageList = pages.result()
    if (pageList.isEmpty) return None
    var refused = 0L
    val texts = pageList.map { case (page, res) =>
      val fonts: Map[String, Font] =
        resolve(res.getOrElse("Font", PNull)) match {
          case PDict(fm) => fm.flatMap { case (k, v) =>
            resolve(v) match {
              case fd: PDict => Some((k, loadFont(fd, objs)))
              case _         => None
            }
          }
          case _ => Map.empty
        }
      val content: Array[Byte] =
        resolve(page.v.getOrElse("Contents", PNull)) match {
          case s: PStream =>
            decodeStream(s, objs).getOrElse { refused += 1; Array.emptyByteArray }
          case PArr(parts) =>
            // join with an injected newline: the spec only promises the
            // split falls between tokens of ONE logical stream — raw
            // concatenation could merge "Tj" with a following "0" into
            // an unknown operator and drop its pending string
            parts.flatMap(p => resolve(p) match {
              case s: PStream => decodeStream(s, objs).map(_ :+ '\n'.toByte)
                .getOrElse { refused += 1; Array.emptyByteArray }
              case _ => Array.emptyByteArray
            }).toArray
          case _ => Array.emptyByteArray
        }
      val (t, r) = pageText(content, fonts)
      refused += r
      t
    }
    Some(PdfText(texts, refused))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode one content stream's text operators. */
  private def pageText(content: Array[Byte],
      fonts: Map[String, Font]): (String, Long) = {
    val out = new StringBuilder
    var refused = 0L
    var font: Font = Font(twoByte = false, Map.empty, null, Map.empty)
    def show(raw: Array[Byte]): Unit = {
      if (font.twoByte) {
        var i = 0
        while (i + 1 < raw.length) {
          val code = ((raw(i) & 0xff) << 8) | (raw(i + 1) & 0xff)
          font.toUnicode.get(code) match {
            case Some(s) => out ++= s
            case None    => refused += 1
          }
          i += 2
        }
      } else raw.foreach { rb =>
        val code = rb & 0xff
        font.differences.get(code)
          .orElse(font.toUnicode.get(code)) match {
          case Some(s) => out ++= s
          case None =>
            if (code >= 0x20 && code <= 0x7e) out += code.toChar
            else if (font.charset != null)
              out ++= new String(Array(rb), font.charset)
            else refused += 1
        }
      }
    }
    val lex = new Lexer(content, 0, content.length)
    var stack = Vector.empty[Obj]
    var lastTmY = Double.NaN
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out += '\n'
    while (lex.pos < content.length) {
      lex.skipWs()
      if (lex.pos >= content.length) ()
      else {
        val c = content(lex.pos) & 0xff
        if (c == '/' || c == '(' || c == '<' || c == '[' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
          stack :+= lex.value()
          if (stack.length > 16) stack = stack.takeRight(16)
        } else {
          val op = lex.token()
          if (op.isEmpty) lex.pos += 1
          else {
            op match {
              case "Tf" => stack.takeRight(2) match {
                case Vector(PName(f), _) =>
                  font = fonts.getOrElse(f,
                    Font(twoByte = false, Map.empty, null, Map.empty))
                case _ => ()
              }
              case "Tj" => stack.lastOption match {
                case Some(PStr(v)) => show(v)
                case _             => ()
              }
              case "TJ" => stack.lastOption match {
                case Some(PArr(items)) => items.foreach {
                  case PStr(v) => show(v)
                  case PNum(k) =>
                    // the standard kerning-space heuristic
                    if (k < -150 && out.nonEmpty && out.last != ' ' &&
                      out.last != '\n') out += ' '
                  case _ => ()
                }
                case _ => ()
              }
              case "'" =>
                newline()
                stack.lastOption match {
                  case Some(PStr(v)) => show(v)
                  case _             => ()
                }
              case "\"" =>
                newline()
                stack.lastOption match {
                  case Some(PStr(v)) => show(v)
                  case _             => ()
                }
              case "T*" => newline()
              case "TD" => stack.takeRight(2) match {
                // TD = Td + set-leading: a purely horizontal move is
                // NOT a new line (OCR layers emit one per word)
                case Vector(PNum(_), PNum(ty)) => if (ty != 0) newline()
                case _                         => newline()
              }
              case "ID" =>
                // inline image: raw binary follows to EI — skip it
                // whole so stray parens in pixel data can't swallow
                // real text operators
                val e = indexOf(content, "EI", lex.pos, content.length)
                lex.pos = if (e < 0) content.length else e + 2
              case "Td" => stack.takeRight(2) match {
                case Vector(PNum(_), PNum(ty)) => if (ty != 0) newline()
                case _                         => ()
              }
              case "Tm" =>
                // newline only on a VERTICAL move: OCR text layers
                // emit one Tm per word on a shared baseline, and a
                // per-word newline would shred the whole corpus
                stack.lastOption match {
                  case Some(PNum(f)) =>
                    if (!lastTmY.isNaN && f != lastTmY) newline()
                    lastTmY = f
                  case _ => newline()
                }
              case "ET" => newline()
              case _    => () // every other operator: operands dropped
            }
            stack = Vector.empty
          }
        }
      }
    }
    (out.toString.stripSuffix("\n"), refused)
  }

  // ------------------------------------------------------------------
  // Document information (/Info) provenance
  // ------------------------------------------------------------------

  /** One provenance row — the [[AudioTags.Tags]] analog for the
    * document heap.
    */
  final case class DocInfo(title: Option[String], author: Option[String],
      year: Option[Int])

  /** PDF text-string decode: UTF-16BE with BOM, else the ASCII subset
    * of PDFDocEncoding (identical to ASCII by construction); non-ASCII
    * PDFDocEncoding bytes are dropped rather than transcribing the
    * 0x80-0xA0 special block from memory.
    */
  private def textString(v: Array[Byte]): String = {
    if (v.length >= 2 && (v(0) & 0xff) == 0xfe && (v(1) & 0xff) == 0xff)
      new String(v, 2, v.length - 2, "UTF-16BE")
    else new String(v.filter(b => b >= 0x20 && b < 0x7f), "US-ASCII")
  }

  /** Title/Author/creation-year from the document information
    * dictionary. The /Info reference is taken from trailer
    * dictionaries (keyword scan — the same damaged-file-tolerant
    * route as the object scan; the LAST trailer in file order wins,
    * matching incremental updates) or, for xref-stream files, from
    * the /Type/XRef stream dict. None when no Info dict resolves or
    * every field is empty.
    */
  def docInfo(b: Array[Byte]): Option[DocInfo] = try {
    if (!isPdf(b)) return None
    val objs = scanObjects(b)
    def resolve(o: Obj): Obj = o match {
      case PRef(n, _) => objs.getOrElse(n, PNull)
      case x          => x
    }
    val info = trailerValue(b, objs, "Info").map(resolve) match {
      case Some(PDict(m)) => m
      case _              => return None
    }
    def str(k: String): Option[String] = resolve(info.getOrElse(k, PNull)) match {
      case PStr(v) =>
        val s = textString(v).trim
        if (s.isEmpty) None else Some(s)
      case _ => None
    }
    val year = resolve(info.getOrElse("CreationDate", PNull)) match {
      case PStr(v) =>
        val s = new String(v.filter(b => b >= 0x20 && b < 0x7f),
          "US-ASCII")
        // "D:YYYYMMDD..." — the D: prefix is optional per spec
        val digits = (if (s.startsWith("D:")) s.drop(2) else s).take(4)
        if (digits.length == 4 && digits.forall(_.isDigit))
          Some(digits.toInt).filter(_ > 0)
        else None
      case _ => None
    }
    val d = DocInfo(str("Title"), str("Author"), year)
    if (d.title.isEmpty && d.author.isEmpty && d.year.isEmpty) None
    else Some(d)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Provenance rows: (doc_id, title, author, year) — one batched
    * map, PDFs without an Info dict contribute nothing.
    */
  def infoTable(s: org.apache.spark.sql.SparkSession,
      media: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        docInfo(b).map(d => (id, d.title, d.author, d.year))
      }
      .toDF("doc_id", "title", "author", "year")
  }

  // ------------------------------------------------------------------
  // Spark surface
  // ------------------------------------------------------------------

  /** Page rows for a media corpus: (doc_id, page, text, refused) —
    * `refused` repeats the DOCUMENT-level unmapped-code count on each
    * row (the fidelity number [[PdfText.refused]] measures). One
    * batched map; rows explode per page.
    */
  def table(s: org.apache.spark.sql.SparkSession,
      media: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        text(b).toSeq.flatMap { pt =>
          pt.pages.zipWithIndex.map { case (t, p) =>
            (id, p, t, pt.refused)
          }
        }
      }
      .toDF("doc_id", "page", "text", "refused")
  }

  // ------------------------------------------------------------------
  // Fixture writer
  // ------------------------------------------------------------------

  /** Fixture writer (the minimalMp4/minimalWebm discipline): a REAL
    * conformant PDF — header, indirect objects, a correct classic
    * xref table + trailer (or, with `objStm`, the non-stream objects
    * packed into an object stream referenced by a conformant
    * cross-reference STREAM with /W type-1/type-2 entries) — with one
    * Helvetica text page per entry, each line its own Td+Tj (or a
    * kerned TJ). Knobs: `flate` deflates content streams; `kerning`
    * splits each line across a -200 TJ gap (the extractor's space
    * heuristic must reinsert exactly one space); `winAnsi` declares
    * /WinAnsiEncoding so latin-1 high bytes decode through cp1252;
    * `toUnicodeShift` adds a /ToUnicode CMap mapping A..Z one
    * codepoint up (B..[) — text only recoverable THROUGH the CMap;
    * `type0` writes a composite Identity-H font with two-byte codes
    * and a bfrange CMap; `lzw` compresses content streams with
    * LZWDecode instead of Flate (`earlyChange = false` adds
    * /EarlyChange 0); `predictor` (2 = TIFF differencing, 10-15 = the
    * PNG row filter of that number) forward-codes content rows of
    * `predictorColumns` bytes before compression (content padded to a
    * whole row with spaces — insignificant whitespace).
    */
  def encode(pages: Seq[Seq[String]], flate: Boolean = true,
      kerning: Boolean = false, winAnsi: Boolean = false,
      toUnicodeShift: Boolean = false, type0: Boolean = false,
      objStm: Boolean = false,
      lzw: Boolean = false, earlyChange: Boolean = true,
      predictor: Int = 0, predictorColumns: Int = 16,
      title: String = null, author: String = null, infoYear: Int = 0,
      utf16Info: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty && pages.forall(_.nonEmpty), "encode args")
    require(!(type0 && (winAnsi || toUnicodeShift || kerning)),
      "type0 is its own variant")
    require(predictor == 0 || predictor == 2 ||
      (predictor >= 10 && predictor <= 14), s"predictor $predictor")
    require(predictor == 0 || flate || lzw,
      "a predictor needs a compression filter")
    val n = pages.length
    def esc(s: String): String =
      s.flatMap {
        case '(' => "\\("
        case ')' => "\\)"
        case '\\' => "\\\\"
        case c => c.toString
      }
    def contentFor(lines: Seq[String]): Array[Byte] = {
      val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, i) =>
        if (i > 0) sb ++= "0 -14 Td\n"
        if (type0) {
          val hex = line.flatMap(c => f"${c.toInt}%04x")
          sb ++= s"<$hex> Tj\n"
        } else if (kerning && line.contains(' ')) {
          val cut = line.indexOf(' ')
          sb ++= s"[(${esc(line.substring(0, cut))})-200(" +
            s"${esc(line.substring(cut + 1))})] TJ\n"
        } else sb ++= s"(${esc(line)}) Tj\n"
      }
      sb ++= "ET\n"
      sb.toString.getBytes(Cp1252) // latin-1 high bytes stay bytes
    }
    def lzwEncode(data: Array[Byte], early: Boolean): Array[Byte] = {
      // greedy LZW mirroring the decoder's width schedule: the width
      // used for code k+1 follows the DECODER's table size after
      // processing code k (258 + k - 1 entries — the decoder adds
      // nothing on the first data code), bumped one early under
      // /EarlyChange 1
      val out = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L
      var bitCnt = 0
      var w = 9
      def put(code: Int): Unit = {
        bitBuf = (bitBuf << w) | code
        bitCnt += w
        while (bitCnt >= 8) {
          out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt)
          bitCnt -= 8
        }
      }
      val e = if (early) 1 else 0
      val dict = scala.collection.mutable.Map.empty[(Int, Byte), Int]
      var nextCode = 258
      var decSize = 258
      var emitted = 0
      def emitData(code: Int): Unit = {
        put(code)
        if (emitted > 0 && decSize < 4096) decSize += 1
        emitted += 1
        if (decSize + e >= (1 << w) && w < 12) w += 1
      }
      put(256) // clear
      if (data.nonEmpty) {
        var cur = data(0) & 0xff
        var i = 1
        while (i < data.length) {
          val b = data(i)
          dict.get((cur, b)) match {
            case Some(c) => cur = c
            case None =>
              emitData(cur)
              if (nextCode < 4096) { dict((cur, b)) = nextCode; nextCode += 1 }
              cur = b & 0xff
          }
          i += 1
        }
        emitData(cur)
      }
      put(257) // EOD
      if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
      out.toByteArray
    }
    def deflate(d: Array[Byte]): Array[Byte] = {
      val df = new java.util.zip.Deflater()
      df.setInput(d); df.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!df.finished()) out.write(buf, 0, df.deflate(buf))
      df.end()
      out.toByteArray
    }
    // object numbering: 1 catalog, 2 pages, 3..2+n page_i,
    // 3+n..2+2n content_i, 3+2n font, (4+2n cmap), (5+2n objstm/xref)
    val fontNum = 3 + 2 * n
    val cmapNum = 4 + 2 * n
    val cmap: Option[String] =
      if (toUnicodeShift) Some {
        // A..Z -> a..z via bfrange: the text is only recoverable
        // THROUGH the CMap (an ASCII passthrough would stay uppercase)
        "/CIDInit /ProcSet findresource begin 1 begincmap\n" +
          "1 beginbfrange <41> <5a> <0061> endbfrange\nendcmap end\n"
      } else if (type0) Some {
        // two-byte codes 0x0061..0x007a are a..z; 0x0020 is space
        "1 begincmap\n2 beginbfrange\n<0061> <007a> <0061>\n" +
          "<0020> <0020> <0020>\nendbfrange\nendcmap\n"
      } else None
    val fontObj =
      if (type0)
        s"<< /Type /Font /Subtype /Type0 /BaseFont /Helvetica " +
          s"/Encoding /Identity-H /ToUnicode $cmapNum 0 R >>"
      else {
        val enc = if (winAnsi) " /Encoding /WinAnsiEncoding" else ""
        val tu = if (toUnicodeShift) s" /ToUnicode $cmapNum 0 R" else ""
        s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica$enc$tu >>"
      }
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    val plain = scala.collection.mutable.LinkedHashMap[Int, String](
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>")
    (0 until n).foreach { i =>
      plain(3 + i) = s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontNum 0 R >> >> " +
        s"/Contents ${3 + n + i} 0 R >>"
    }
    plain(fontNum) = fontObj
    // /Info document-information dict (title/author/creation date),
    // UTF-16BE-with-BOM hex strings on request; packed into the
    // ObjStm in that mode (it is not a stream)
    val infoNum = cmapNum + 1
    if (title != null || author != null || infoYear > 0) {
      def pdfStr(v: String): String =
        if (utf16Info) "<FEFF" + v.flatMap(c => f"${c.toInt}%04X") + ">"
        else "(" + esc(v) + ")"
      val parts = Seq(
        Option(title).map(t => s"/Title ${pdfStr(t)}"),
        Option(author).map(a => s"/Author ${pdfStr(a)}"),
        if (infoYear > 0)
          Some(s"/CreationDate (D:${infoYear}0102030405)")
        else None).flatten.mkString(" ")
      plain(infoNum) = s"<< $parts >>"
    }
    val infoRef =
      if (plain.contains(infoNum)) s" /Info $infoNum 0 R" else ""
    // predictor FORWARD pass (colors=1, bpc=8): content padded to a
    // whole row with spaces, then TIFF-differenced or PNG-row-filtered
    def predict(raw0: Array[Byte]): Array[Byte] = {
      val cols = predictorColumns
      val pad = (cols - raw0.length % cols) % cols
      val p = raw0 ++ Array.fill(pad)(' '.toByte)
      if (predictor == 2) {
        val d = p.clone()
        var r = 0
        while (r < d.length) {
          var x = cols - 1
          while (x >= 1) {
            d(r + x) = ((p(r + x) - p(r + x - 1)) & 0xff).toByte
            x -= 1
          }
          r += cols
        }
        d
      } else {
        val ft = predictor - 10
        val rows = p.length / cols
        val d = new Array[Byte]((cols + 1) * rows)
        var y = 0
        while (y < rows) {
          d(y * (cols + 1)) = ft.toByte
          var x = 0
          while (x < cols) {
            val v = p(y * cols + x) & 0xff
            val a = if (x >= 1) p(y * cols + x - 1) & 0xff else 0
            val u = if (y >= 1) p((y - 1) * cols + x) & 0xff else 0
            val c =
              if (x >= 1 && y >= 1) p((y - 1) * cols + x - 1) & 0xff
              else 0
            val pv = ft match {
              case 0 => 0
              case 1 => a
              case 2 => u
              case 3 => (a + u) >> 1
              case _ =>
                val pr = a + u - c
                val pa = math.abs(pr - a); val pb = math.abs(pr - u)
                val pc = math.abs(pr - c)
                if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c
            }
            d(y * (cols + 1) + 1 + x) = ((v - pv) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        d
      }
    }
    val parmEntries = Seq(
      if (predictor > 1)
        Some(s"/Predictor $predictor /Colors 1 /BitsPerComponent 8 " +
          s"/Columns $predictorColumns")
      else None,
      if (lzw && !earlyChange) Some("/EarlyChange 0") else None).flatten
    val parmStr =
      if (parmEntries.isEmpty) ""
      else s" /DecodeParms << ${parmEntries.mkString(" ")} >>"
    // streams are always top-level (the spec forbids them in ObjStms)
    val streams = scala.collection.mutable.LinkedHashMap.empty[Int, (String, Array[Byte])]
    (0 until n).foreach { i =>
      val raw0 = contentFor(pages(i))
      val raw = if (predictor > 1) predict(raw0) else raw0
      val (data, filter) =
        if (lzw) (lzwEncode(raw, earlyChange), " /Filter /LZWDecode")
        else if (flate) (deflate(raw), " /Filter /FlateDecode")
        else (raw, "")
      streams(3 + n + i) =
        (s"<< /Length ${data.length}$filter$parmStr >>", data)
    }
    cmap.foreach { c =>
      val d = c.getBytes("ISO-8859-1")
      streams(cmapNum) = (s"<< /Length ${d.length} >>", d)
    }
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n%âãÏÓ\n")
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def writeObj(num: Int, body: String,
        data: Option[Array[Byte]]): Unit = {
      offsets(num) = out.size()
      w(s"$num 0 obj\n$body\n")
      data.foreach { d =>
        w("stream\n"); out.write(d); w("\nendstream\n")
      }
      w("endobj\n")
    }
    if (!objStm) {
      plain.foreach { case (num, body) => writeObj(num, body, None) }
      streams.foreach { case (num, (dict, d)) =>
        writeObj(num, dict, Some(d))
      }
      // classic xref table + trailer (unused numbers = free entries)
      val maxNum = (plain.keys ++ streams.keys).max
      val xrefOff = out.size()
      w(s"xref\n0 ${maxNum + 1}\n")
      w("0000000000 65535 f \n")
      (1 to maxNum).foreach { num =>
        offsets.get(num) match {
          case Some(o) => w(f"$o%010d 00000 n \n")
          case None    => w("0000000000 65535 f \n")
        }
      }
      w(s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R$infoRef >>\n" +
        s"startxref\n$xrefOff\n%%EOF\n")
    } else {
      // pack the non-stream objects into an ObjStm + xref STREAM
      val stmNum = cmapNum + 2
      val xrefNum = cmapNum + 3
      val hdr = new StringBuilder
      val body = new StringBuilder
      plain.foreach { case (num, s) =>
        hdr ++= s"$num ${body.length} "
        body ++= s
        body += '\n'
      }
      val first = hdr.length
      val stmData = (hdr.toString + body.toString).getBytes("ISO-8859-1")
      streams.foreach { case (num, (dict, d)) =>
        writeObj(num, dict, Some(d))
      }
      // real files always Flate their ObjStms — the fixture does too,
      // so scanObjects' expansion exercises the filter chain
      val stmZ = deflate(stmData)
      writeObj(stmNum,
        s"<< /Type /ObjStm /N ${plain.size} /First $first " +
          s"/Filter /FlateDecode /Length ${stmZ.length} >>", Some(stmZ))
      // xref stream: W [1 2 2]; type-1 rows for top-level objects,
      // type-2 (objstm, index) for the packed ones
      val maxNum = xrefNum
      val rows = new java.io.ByteArrayOutputStream()
      def row(t: Int, a: Int, c: Int): Unit = {
        rows.write(t)
        rows.write((a >> 8) & 0xff); rows.write(a & 0xff)
        rows.write((c >> 8) & 0xff); rows.write(c & 0xff)
      }
      val xrefOff = out.size()
      row(0, 0, 65535)
      (1 to maxNum).foreach { num =>
        if (num == xrefNum) row(1, xrefOff, 0)
        else if (offsets.contains(num)) row(1, offsets(num), 0)
        else {
          val idx = plain.keys.toSeq.indexOf(num)
          row(2, stmNum, math.max(0, idx))
        }
      }
      val rd = rows.toByteArray
      require(out.size() < 65536,
        "objStm fixture too large for 2-byte xref-stream offsets")
      writeObj(xrefNum,
        s"<< /Type /XRef /Size ${maxNum + 1} /W [1 2 2] /Root 1 0 R" +
          s"$infoRef /Length ${rd.length} >>", Some(rd))
      w(s"startxref\n$xrefOff\n%%EOF\n")
    }
    out.toByteArray
  }
}
