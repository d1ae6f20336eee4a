package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] RTF text extraction — the legacy rich-text document class
  * (Word-era email bodies, .rtf attachments), implemented from the
  * public RTF specification. RTF is a brace-grouped control-word
  * stream, so the whole surface is a tokenizer:
  *
  *  - GROUPS: `{...}` push/pull state (the `\ucN` skip count is
  *    group-scoped per spec); non-text DESTINATIONS are skipped whole
  *    — every `{\*\...}` starred destination (the spec's own
  *    "readers that don't understand this must skip it" rule) and
  *    the known binary/metadata groups (fonttbl, colortbl,
  *    stylesheet, pict, object, header/footer, themedata, …).
  *  - TEXT: plain characters; `\par`/`\line`/`\sect`/`\page` break
  *    lines, `\tab` and `\~` space, `\'hh` decodes one byte through
  *    the `\ansicpgN` code page via the JDK charset registry
  *    (cp1252 default — no code-point table transcribed), `\uN`
  *    emits the Unicode scalar and skips the group's `\ucN`
  *    fallback characters. The handful of unambiguous named symbol
  *    words (emdash/endash/bullet/quotes/nbsp) decode — the tiny-AGL
  *    discipline; every OTHER unknown control word is IGNORED, which
  *    is the spec's own prescribed reader behavior (not a silent
  *    boundary: renderable-symbol loss is impossible because the
  *    spec defines text to flow as plain characters).
  *  - PROVENANCE: the `{\info ...}` destination's `\title`,
  *    `\author` and `\creatim\yrNNNN` — the DocInfo analog.
  *
  * Scale shape: [[table]] is one batched map over the media column —
  * no shuffle, no driver collect (the [[Pdf.table]] discipline).
  */
object Rtf {

  final case class RtfText(title: Option[String], author: Option[String],
      year: Option[Int], text: String)

  def isRtf(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && b(0) == '{' && b(1) == '\\' &&
      b(2) == 'r' && b(3) == 't' && b(4) == 'f'

  /** Destinations whose content is never document text. */
  private val SkipDest: Set[String] = Set(
    "fonttbl", "colortbl", "stylesheet", "listtable",
    "listoverridetable", "pict", "object", "header", "footer",
    "headerl", "headerr", "headerf", "footerl", "footerr", "footerf",
    "ftnsep", "ftnsepc", "xmlnstbl", "themedata", "colorschememapping",
    "latentstyles", "datastore", "generator", "fchars", "lchars",
    "revtbl")

  private val Symbols: Map[String, String] = Map(
    "emdash" -> "\u2014", "endash" -> "\u2013", "bullet" -> "\u2022",
    "lquote" -> "\u2018", "rquote" -> "\u2019",
    "ldblquote" -> "\u201c", "rdblquote" -> "\u201d")

  def text(b: Array[Byte]): Option[RtfText] = try {
    if (!isRtf(b)) return None
    // the token stream is ASCII + \'hh high bytes: ISO-8859-1 keeps
    // every byte value addressable for the codepage decode
    val s = new String(b, "ISO-8859-1")
    val n = s.length
    var charset: java.nio.charset.Charset =
      java.nio.charset.Charset.forName("windows-1252")
    val out = new StringBuilder
    var title: Option[String] = None
    var author: Option[String] = None
    var year: Option[Int] = None
    // group state: (uc skip count, mode) — mode 0 body text, 1 skip,
    // 2 info container, 3 info title, 4 info author
    var uc = 1
    var mode = 0
    var stack = List.empty[(Int, Int)]
    val infoBuf = new StringBuilder
    def emit(str: String): Unit = {
      if (mode == 0) out ++= str
      else if (mode == 3 || mode == 4) infoBuf ++= str
    }
    def newline(): Unit =
      if (mode == 0 && out.nonEmpty && out.last != '\n') out += '\n'
    var i = 0
    var depthGuard = 0
    while (i < n && depthGuard < (1 << 24)) {
      depthGuard += 1
      val c = s.charAt(i)
      if (c == '{') {
        stack = (uc, mode) :: stack
        if (stack.length > 256) return None // hostile nesting
        // peek: {\*\dest ...} is a skippable destination
        if (i + 2 < n && s.charAt(i + 1) == '\\' && s.charAt(i + 2) == '*')
          mode = if (mode == 2) mode else 1
        i += 1
      } else if (c == '}') {
        stack match {
          case (u, m) :: rest =>
            // closing an info field: commit the buffered text
            if (mode == 3 && m != 3) {
              val t = infoBuf.toString.trim
              if (t.nonEmpty && title.isEmpty) title = Some(t)
              infoBuf.clear()
            } else if (mode == 4 && m != 4) {
              val t = infoBuf.toString.trim
              if (t.nonEmpty && author.isEmpty) author = Some(t)
              infoBuf.clear()
            }
            uc = u; mode = m; stack = rest
          case Nil => () // stray close: ignore
        }
        i += 1
      } else if (c == '\\') {
        if (i + 1 >= n) { i = n }
        else {
          val c2 = s.charAt(i + 1)
          if (c2 == '\'') {
            // \'hh — one byte through the current code page
            if (i + 3 < n) {
              val h1 = Character.digit(s.charAt(i + 2), 16)
              val h2 = Character.digit(s.charAt(i + 3), 16)
              if (h1 >= 0 && h2 >= 0)
                emit(new String(Array(((h1 << 4) | h2).toByte), charset))
              i += 4
            } else i = n
          } else if (c2.isLetter) {
            var j = i + 1
            while (j < n && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            // optional signed numeric parameter
            var k = j
            var sign = 1
            if (k < n && s.charAt(k) == '-') { sign = -1; k += 1 }
            val ds = k
            while (k < n && k - ds < 10 && s.charAt(k).isDigit) k += 1
            val param: Option[Int] =
              if (k > ds)
                try Some(sign * s.substring(ds, k).toInt)
                catch { case _: NumberFormatException => None }
              else None
            // one space after a control word is part of the word
            if (k < n && s.charAt(k) == ' ') k += 1
            word match {
              case "par" | "line" | "sect" | "page" => newline()
              case "tab" => emit(" ")
              case "uc" => uc = param.getOrElse(1).max(0).min(8)
              case "u" =>
                val cp = param.getOrElse(0)
                val scalar = if (cp < 0) cp + 65536 else cp
                // surrogate halves pass through: the spec encodes
                // astral chars as TWO \u words whose UTF-16 halves
                // recombine in the output string
                if (scalar > 0 && scalar <= 0xffff)
                  emit(scalar.toChar.toString)
                // skip the group's fallback characters (bytes or \'hh)
                var skip = uc
                while (skip > 0 && k < n) {
                  if (s.charAt(k) == '\\' && k + 3 < n &&
                    s.charAt(k + 1) == '\'') k += 4
                  else if (s.charAt(k) == '\\' || s.charAt(k) == '{' ||
                    s.charAt(k) == '}') skip = 0 // group/word: stop
                  else k += 1
                  if (skip > 0) skip -= 1
                }
              case "ansicpg" =>
                param.foreach { cp =>
                  try charset =
                    java.nio.charset.Charset.forName(s"windows-$cp")
                  catch {
                    case scala.util.control.NonFatal(_) =>
                      try charset =
                        java.nio.charset.Charset.forName(s"cp$cp")
                      catch { case scala.util.control.NonFatal(_) => () }
                  }
                }
              case "bin" =>
                // raw binary bytes follow — skip them whole or the
                // walk shifts into pixel data
                val len = param.getOrElse(0).max(0)
                k = math.min(n.toLong, k.toLong + len).toInt
              case "info" if mode == 0 || mode == 2 => mode = 2
              case "title" if mode == 2  => mode = 3
              case "author" if mode == 2 => mode = 4
              case "yr" if mode == 2 =>
                if (year.isEmpty)
                  year = param.filter(y => y > 0 && y < 10000)
              case w if Symbols.contains(w) => emit(Symbols(w))
              case w if SkipDest.contains(w) =>
                if (mode == 0) mode = 1
              case _ => () // unknown control word: ignored per spec
            }
            i = k
          } else {
            // control symbol
            c2 match {
              case '~'  => emit(" ")
              case '-'  => () // optional hyphen: drop
              case '_'  => emit("-")
              case '\\' => emit("\\")
              case '{'  => emit("{")
              case '}'  => emit("}")
              case '*'  => () // handled at group open; stray: ignore
              case '\n' | '\r' => newline() // \<newline> = \par
              case _ => ()
            }
            i += 2
          }
        }
      } else if (c == '\r' || c == '\n') {
        i += 1 // raw newlines are NOT document text in RTF
      } else {
        emit(c.toString)
        i += 1
      }
    }
    Some(RtfText(title, author, year,
      out.toString.replaceAll("[ \\t]+", " ")
        .replaceAll(" ?\\n ?", "\n").trim))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Document rows: (doc_id, title, author, year, text) — one
    * batched map; non-RTF payloads contribute nothing.
    */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        text(b).map(t => (id, t.title, t.author, t.year, t.text))
      }
      .toDF("doc_id", "title", "author", "year", "text")
  }

  /** Fixture writer: a real RTF document — font/color tables (must be
    * skipped), an info group, paragraphs with escapes, optional
    * cp1252 high bytes and \uN unicode with fallbacks.
    */
  def encode(paragraphs: Seq[String], title: String = null,
      author: String = null, year: Int = 0,
      codepage: Int = 1252): Array[Byte] = {
    require(paragraphs.nonEmpty, "encode: paragraphs")
    val cs = java.nio.charset.Charset.forName(s"windows-$codepage")
    def esc(p: String): String = {
      val sb = new StringBuilder
      p.foreach {
        case '\\' => sb ++= "\\\\"
        case '{'  => sb ++= "\\{"
        case '}'  => sb ++= "\\}"
        case ch if ch < 0x80 => sb += ch
        case ch =>
          val enc = ch.toString.getBytes(cs)
          // encodable in the page -> \'hh, else \uN with one '?'
          if (enc.length == 1 && cs.decode(
            java.nio.ByteBuffer.wrap(enc)).toString == ch.toString)
            sb ++= f"\\'${enc(0) & 0xff}%02x"
          else sb ++= s"\\u${ch.toInt}?"
      }
      sb.toString
    }
    val info =
      if (title == null && author == null && year <= 0) ""
      else "{\\info" +
        Option(title).map(t => s"{\\title ${esc(t)}}").getOrElse("") +
        Option(author).map(a => s"{\\author ${esc(a)}}").getOrElse("") +
        (if (year > 0) s"{\\creatim\\yr$year\\mo1\\dy2}" else "") + "}"
    val body = paragraphs.map(esc).mkString("\\par\n")
    val doc = s"{\\rtf1\\ansi\\ansicpg$codepage\\deff0" +
      "{\\fonttbl{\\f0\\fswiss Helvetica;}}" +
      "{\\colortbl;\\red0\\green0\\blue0;}" +
      "{\\*\\generator graft fixture;}" +
      info + "\n" + body + "\\par}"
    doc.getBytes("ISO-8859-1")
  }
}
