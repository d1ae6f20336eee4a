package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] Subtitle/caption TEXT extraction — the text modality carried
  * inside the video heap, a first-class training-corpus source (every
  * captioned video is a timestamped transcript). Four wild carriers,
  * all pure container/text math with zero codec work:
  *
  *  - Matroska/WebM `S_TEXT/UTF8` tracks (the mkvmerge SRT-mux layout):
  *    Tracks declares the codec per track number, each cue is a Block
  *    whose payload IS the UTF-8 cue text, timed by the cluster
  *    timestamp + the block's relative offset in TimestampScale ticks,
  *    with BlockDuration for the span. Reuses the size-validated
  *    [[Multimodal.ContainerCodec.walkEbml]] — malformed elements stop
  *    the walk, never shift it.
  *  - Matroska `S_TEXT/ASS` / `S_TEXT/SSA` tracks (the dominant styled
  *    codec in wild MKVs): the block payload is the script's Dialogue
  *    line with Start/End removed — `ReadOrder, Layer, Style, Name,
  *    MarginL, MarginR, MarginV, Effect, Text` — so the cue text is
  *    everything after the 8th comma, run through [[cleanAss]].
  *  - MP4 3GPP timed text (`tx3g`, QuickTime `text`): the full
  *    ISO-BMFF sample-table walk — stsd codec check, stts timing,
  *    stsc run-length sample-to-chunk mapping, stco/co64 + stsz
  *    sample location — each sample a u16be-length UTF-8 string.
  *  - SubRip (.srt): `index / HH:MM:SS,mmm --> HH:MM:SS,mmm / text`
  *    blocks separated by blank lines.
  *  - WebVTT (.vtt): the `WEBVTT` header and `HH:MM:SS.mmm -->
  *    HH:MM:SS.mmm` cues (hours optional), dot or comma millis — one
  *    parser covers both text forms.
  *  - Standalone SubStation Alpha (.ass/.ssa): `[Events]` section,
  *    `Format:` field order honored (Text is the spec'd LAST field —
  *    it may itself contain commas), `Dialogue:` lines with
  *    `H:MM:SS.cc` centisecond timings; `Comment:` lines and every
  *    other section ([V4+ Styles], [Fonts], …) contribute nothing.
  *
  * ASS text cleanup ([[cleanAss]]): `{...}` override blocks drop,
  * `\N` is a hard line break, `\n` a soft break (a space under the
  * default WrapStyle — the one rendering-mode choice, documented),
  * `\h` the spec's hard space (U+00A0). Nothing else is interpreted.
  *
  * Scale shape: [[table]] is one batched map over the media column
  * (the [[AudioTags.table]] discipline) — rows explode per cue, no
  * shuffle, no driver collect.
  */
object Subtitles {

  /** One cue; `track` is 0 for text-file carriers. */
  final case class Cue(track: Int, startMs: Long, durMs: Long,
      text: String)

  /** Matroska S_TEXT/UTF8 cue extraction. Returns None when the bytes
    * are not EBML or carry no subtitle track; laced subtitle blocks
    * (never written by real muxers — one cue per block is the spec'd
    * layout) are skipped rather than guessed at.
    *
    * TWO passes per Segment: track declarations (Tracks) and the
    * timestamp scale (Info) are collected FIRST, then Clusters are
    * walked — a streamed/live mux may legally write Clusters before
    * Tracks in file order, and a single pass would silently drop every
    * cue in such a file.
    */
  def mkvCues(b: Array[Byte]): Option[Seq[Cue]] = try {
    val C = Multimodal.ContainerCodec
    if (b == null || !C.isEbml(b)) return None
    var tsScale = 1000000L // Matroska default: 1 ms ticks
    // track number -> is the payload an ASS/SSA Dialogue remnant
    // (true) or bare UTF-8 cue text (false)?
    val subTracks = scala.collection.mutable.Map.empty[Long, Boolean]
    val cues = scala.collection.mutable.ArrayBuffer.empty[Cue]
    C.walkEbml(b, 0, b.length) { (id, po, pe) =>
      if (id == 0x18538067L) { // Segment
        C.walkEbml(b, po, pe) { (id2, qo, qe) => // pass 1: Info + Tracks
          if (id2 == 0x1549A966L) { // Info
            C.walkEbml(b, qo, qe) { (id3, ro, re) =>
              if (id3 == 0x2AD7B1L) tsScale = C.ebmlUint(b, ro, re)
              true
            }
          } else if (id2 == 0x1654AE6BL) { // Tracks
            C.walkEbml(b, qo, qe) { (id3, ro, re) =>
              if (id3 == 0xAEL) { // TrackEntry
                var num = -1L
                var codec = ""
                C.walkEbml(b, ro, re) { (id4, so, se) =>
                  if (id4 == 0xD7L) num = C.ebmlUint(b, so, se)
                  else if (id4 == 0x86L)
                    codec = new String(b, so, se - so, "US-ASCII")
                  true
                }
                if (num > 0 && codec == "S_TEXT/UTF8")
                  subTracks(num) = false
                else if (num > 0 &&
                  (codec == "S_TEXT/ASS" || codec == "S_TEXT/SSA"))
                  subTracks(num) = true
              }
              true
            }
          }
          true
        }
        C.walkEbml(b, po, pe) { (id2, qo, qe) => // pass 2: Clusters
          if (id2 == 0x1F43B675L) { // Cluster
            var clusterTs = 0L
            def block(so: Int, se: Int, durTicks: Long): Unit = {
              val (track0, tLen) = C.ebmlVint(b, so, se, keepMarker = false)
              // ebmlVint maps an all-ones value to -1 (the SIZE field's
              // unknown sentinel) — wrong for a track-number vint,
              // where e.g. the 1-byte 0xFF legitimately means track
              // 127: undo the mapping or every cue on that track drops
              val track =
                if (track0 == -1L) (1L << (7 * tLen)) - 1 else track0
              if (tLen == 0 || !subTracks.contains(track)) return
              val fo = so + tLen
              if (fo + 3 > se) return
              val rel = (((b(fo) & 0xff) << 8) | (b(fo + 1) & 0xff)).toShort
              val flags = b(fo + 2) & 0xff
              if ((flags & 0x06) != 0) return // laced: skip, don't guess
              val raw = new String(b, fo + 3, se - (fo + 3), "UTF-8")
              // S_TEXT/ASS blocks carry the Dialogue line minus its
              // Start/End fields: ReadOrder, Layer, Style, Name,
              // MarginL, MarginR, MarginV, Effect, Text — the text is
              // everything past the 8th comma. A payload with fewer
              // fields is not a Dialogue remnant: skip the cue, never
              // guess at a field split.
              val text =
                if (!subTracks(track)) raw
                else {
                  val at = afterNthComma(raw, 8)
                  if (at < 0) return
                  cleanAss(raw.substring(at))
                }
              val startMs = (clusterTs + rel) * tsScale / 1000000L
              val durMs = durTicks * tsScale / 1000000L
              cues += Cue(track.toInt, startMs, durMs, text)
            }
            C.walkEbml(b, qo, qe) { (id3, ro, re) =>
              if (id3 == 0xE7L) clusterTs = C.ebmlUint(b, ro, re)
              else if (id3 == 0xA3L) block(ro, re, 0L) // SimpleBlock
              else if (id3 == 0xA0L) { // BlockGroup
                var bo = -1
                var be = -1
                var dur = 0L
                C.walkEbml(b, ro, re) { (id4, so, se) =>
                  if (id4 == 0xA1L) { bo = so; be = se }
                  else if (id4 == 0x9BL) dur = C.ebmlUint(b, so, se)
                  true
                }
                if (bo >= 0) block(bo, be, dur)
              }
              true
            }
          }
          true
        }
      }
      true
    }
    if (subTracks.isEmpty) None
    else Some(cues.toSeq)
  } catch { case scala.util.control.NonFatal(_) => None }

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** MP4 timed-text (3GPP `tx3g` / QuickTime `text`) cue extraction —
    * the full sample-table walk: stsd declares the per-track codec,
    * stts expands to per-sample (start, duration) on the mdhd
    * timescale, stsc's run-length sample-to-chunk mapping + stco/co64
    * chunk offsets + stsz sizes locate each sample in mdat, and a
    * sample's payload is u16be text length + UTF-8 text. Every offset
    * and count is validated against the file (capped entry counts, no
    * over-reads); None when the bytes aren't MP4 or no text track
    * exists.
    */
  def mp4Cues(b: Array[Byte]): Option[Seq[Cue]] = try {
    if (b == null || !Multimodal.ContainerCodec.isMp4(b)) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    var anyText = false
    var trackNo = 0
    val Cap = 1 << 20
    AudioTags.walkMp4(b, 0, b.length) { (t, po, pe) =>
      if (t == "moov") AudioTags.walkMp4(b, po, pe) { (t2, qo, qe) =>
        if (t2 == "trak") {
          trackNo += 1
          var timescale = 0L
          var isText = false
          var sttsRuns = Array.empty[(Long, Long)]
          var sizes = Array.empty[Int]
          var stscRuns = Array.empty[(Int, Int)]
          var chunkOffs = Array.empty[Long]
          def stbl(so: Int, se: Int): Unit = {
            AudioTags.walkMp4(b, so, se) { (t5, vo, ve) =>
              t5 match {
                case "stsd" if ve - vo >= 16 =>
                  val fmt = new String(b, vo + 12, 4, "ISO-8859-1")
                  isText = fmt == "tx3g" || fmt == "text"
                case "stts" if ve - vo >= 8 =>
                  val n = u32(b, vo + 4).toInt
                  if (n >= 0 && n <= Cap && vo + 8 + 8L * n <= ve)
                    sttsRuns = Array.tabulate(n)(k =>
                      (u32(b, vo + 8 + 8 * k), u32(b, vo + 12 + 8 * k)))
                case "stsz" if ve - vo >= 12 =>
                  val fixed = u32(b, vo + 4)
                  val n = u32(b, vo + 8).toInt
                  if (n >= 0 && n <= Cap) {
                    if (fixed != 0) sizes = Array.fill(n)(fixed.toInt)
                    else if (vo + 12 + 4L * n <= ve)
                      sizes = Array.tabulate(n)(k =>
                        u32(b, vo + 12 + 4 * k).toInt)
                  }
                case "stsc" if ve - vo >= 8 =>
                  val n = u32(b, vo + 4).toInt
                  if (n >= 0 && n <= Cap && vo + 8 + 12L * n <= ve)
                    stscRuns = Array.tabulate(n)(k =>
                      (u32(b, vo + 8 + 12 * k).toInt,
                        u32(b, vo + 12 + 12 * k).toInt))
                case "stco" if ve - vo >= 8 =>
                  val n = u32(b, vo + 4).toInt
                  if (n >= 0 && n <= Cap && vo + 8 + 4L * n <= ve)
                    chunkOffs = Array.tabulate(n)(k =>
                      u32(b, vo + 8 + 4 * k))
                case "co64" if ve - vo >= 8 =>
                  val n = u32(b, vo + 4).toInt
                  if (n >= 0 && n <= Cap && vo + 8 + 8L * n <= ve)
                    chunkOffs = Array.tabulate(n)(k =>
                      (u32(b, vo + 8 + 8 * k) << 32) |
                        u32(b, vo + 12 + 8 * k))
                case _ => ()
              }
              true
            }
            ()
          }
          AudioTags.walkMp4(b, qo, qe) { (t3, ro, re) =>
            if (t3 == "mdia") AudioTags.walkMp4(b, ro, re) { (t4, so, se) =>
              if (t4 == "mdhd" && se - so >= 4) {
                val v = b(so) & 0xff
                if (v == 0 && se - so >= 16) timescale = u32(b, so + 12)
                else if (v == 1 && se - so >= 24) timescale = u32(b, so + 20)
              } else if (t4 == "minf") AudioTags.walkMp4(b, so, se) {
                (t5, vo, ve) =>
                  if (t5 == "stbl") stbl(vo, ve)
                  true
              }
              true
            }
            true
          }
          if (isText && timescale > 0 && sizes.nonEmpty &&
            chunkOffs.nonEmpty && stscRuns.nonEmpty && sttsRuns.nonEmpty) {
            anyText = true
            // per-sample (startTicks, durTicks) from the stts runs
            val starts = new Array[Long](sizes.length)
            val durs = new Array[Long](sizes.length)
            var s = 0
            var tAcc = 0L
            var r = 0
            while (r < sttsRuns.length && s < sizes.length) {
              val (cnt, delta) = sttsRuns(r)
              var k = 0L
              while (k < cnt && s < sizes.length) {
                starts(s) = tAcc
                durs(s) = delta
                tAcc += delta
                s += 1
                k += 1
              }
              r += 1
            }
            // walk chunks through the stsc run map, reading samples
            s = 0
            var chunk = 0
            var run = 0
            while (s < sizes.length && chunk < chunkOffs.length) {
              while (run + 1 < stscRuns.length &&
                stscRuns(run + 1)._1 <= chunk + 1) run += 1
              val spc = stscRuns(run)._2
              var off = chunkOffs(chunk)
              var k = 0
              while (k < spc && s < sizes.length) {
                val sz = sizes(s)
                if (off >= 0 && sz >= 2 && off + sz <= b.length) {
                  val o = off.toInt
                  val tl = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
                  if (tl >= 0 && 2 + tl <= sz) {
                    val text = new String(b, o + 2, tl, "UTF-8")
                    if (text.nonEmpty)
                      out += Cue(trackNo,
                        starts(s) * 1000 / timescale,
                        durs(s) * 1000 / timescale, text)
                  }
                }
                off += sz
                s += 1
                k += 1
              }
              chunk += 1
            }
          }
        }
        true
      }
      true
    }
    if (!anyText) None else Some(out.toSeq)
  } catch { case scala.util.control.NonFatal(_) => None }

  // `HH:` optional; exactly 3 millisecond digits; SRT comma or VTT
  // dot. Hours are BOUNDED at 6 digits: an unbounded (\d+) lets a
  // hostile cue overflow Long in toLong and throw out of the Spark
  // task (review find r15) — 999999 hours is past any real media
  private val TimeLine =
    ("""(?:(\d{1,6}):)?(\d{1,2}):(\d{1,2})[.,](\d{3})""" +
      """\s*-->\s*""" +
      """(?:(\d{1,6}):)?(\d{1,2}):(\d{1,2})[.,](\d{3}).*""").r

  /** SubRip / WebVTT cue parse. Lines before the first timing line
    * (indices, the WEBVTT header, NOTE blocks without timings) are
    * ignored; a cue's text is every non-blank line after its timing
    * line, newline-joined.
    */
  def parseSrt(s: String): Seq[Cue] = {
    def ms(h: String, m: String, sec: String, milli: String): Long =
      (if (h == null) 0L else h.toLong) * 3600000L +
        m.toLong * 60000L + sec.toLong * 1000L + milli.toLong
    val lines = s.replace("\r\n", "\n").replace('\r', '\n').split('\n')
    val out = Seq.newBuilder[Cue]
    var i = 0
    while (i < lines.length) {
      lines(i).trim match {
        case TimeLine(h1, m1, s1, f1, h2, m2, s2, f2) =>
          val start = ms(h1, m1, s1, f1)
          val end = ms(h2, m2, s2, f2)
          val text = new StringBuilder
          i += 1
          while (i < lines.length && lines(i).trim.nonEmpty) {
            if (text.nonEmpty) text += '\n'
            text ++= lines(i).trim
            i += 1
          }
          if (text.nonEmpty)
            out += Cue(0, start, math.max(0L, end - start), text.toString)
        case _ => i += 1
      }
    }
    out.result()
  }

  /** Index just past the `n`th comma of `s`, or -1 when `s` holds
    * fewer than `n` commas.
    */
  private def afterNthComma(s: String, n: Int): Int = {
    var seen = 0
    var i = 0
    while (i < s.length && seen < n) {
      if (s.charAt(i) == ',') seen += 1
      i += 1
    }
    if (seen == n) i else -1
  }

  /** ASS/SSA dialogue-text cleanup: `{...}` override blocks drop
    * whole (an unterminated `{` drops the tail — renderers treat it
    * as an open block), `\N` is a hard line break, `\n` a soft break
    * (a space under the default WrapStyle — the documented rendering
    * choice), `\h` the spec's hard space (U+00A0). Every other
    * backslash sequence is literal text.
    */
  def cleanAss(t: String): String = {
    val out = new StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '{') {
        val close = t.indexOf('}', i + 1)
        i = if (close < 0) t.length else close + 1
      } else if (c == '\\' && i + 1 < t.length) {
        t.charAt(i + 1) match {
          case 'N' => out += '\n'; i += 2
          case 'n' => out += ' '; i += 2
          case 'h' => out += '\u00A0'; i += 2
          case _ => out += c; i += 1
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  // `H:MM:SS.cc` — the ASS timestamp; centiseconds per spec, a lone
  // or triple fraction digit scaled rather than refused. Hours
  // bounded like [[TimeLine]]'s (the same Long-overflow class)
  private val AssTime = """(\d{1,6}):(\d{1,2}):(\d{1,2})\.(\d{1,3})""".r

  private def assMs(t: String): Option[Long] = t.trim match {
    case AssTime(h, m, sec, f) =>
      val frac = f.length match {
        case 1 => f.toLong * 100
        case 2 => f.toLong * 10
        case _ => f.toLong
      }
      Some(h.toLong * 3600000L + m.toLong * 60000L +
        sec.toLong * 1000L + frac)
    case _ => None
  }

  /** Standalone SubStation Alpha (.ass/.ssa) parse: only the
    * `[Events]` section speaks; its `Format:` line fixes the field
    * order (Start/End positions honored; Text is the spec'd last
    * field, so it keeps its own commas), defaulting to the standard
    * V4+ ten-field layout when absent. `Dialogue:` lines become cues;
    * `Comment:` lines and all other sections are dropped.
    */
  def parseAss(s: String): Seq[Cue] = {
    val lines = s.replace("\r\n", "\n").replace('\r', '\n').split('\n')
    val out = Seq.newBuilder[Cue]
    var inEvents = false
    var startIdx = 1
    var endIdx = 2
    var nFields = 10
    for (raw <- lines) {
      val line = raw.trim
      if (line.startsWith("[")) {
        inEvents = line.equalsIgnoreCase("[Events]")
      } else if (inEvents && line.regionMatches(true, 0, "Format:", 0, 7)) {
        val fields = line.substring(7).split(',').map(_.trim.toLowerCase)
        if (fields.nonEmpty) {
          nFields = fields.length
          val si = fields.indexOf("start")
          val ei = fields.indexOf("end")
          if (si >= 0) startIdx = si
          if (ei >= 0) endIdx = ei
        }
      } else if (inEvents &&
        line.regionMatches(true, 0, "Dialogue:", 0, 9)) {
        val rest = line.substring(9).dropWhile(_ == ' ')
        val parts = rest.split(",", nFields)
        if (parts.length == nFields && startIdx < nFields - 1 &&
          endIdx < nFields - 1) {
          (assMs(parts(startIdx)), assMs(parts(endIdx))) match {
            case (Some(st), Some(en)) =>
              val text = cleanAss(parts(nFields - 1))
              if (text.nonEmpty)
                out += Cue(0, st, math.max(0L, en - st), text)
            case _ => ()
          }
        }
      }
    }
    out.result()
  }

  // leading [mm:ss.xx] stamps (minutes unbounded to 3 digits — LRC
  // has no hours field; fraction centiseconds or millis, optional)
  private val LrcStamp = """\[(\d{1,3}):(\d{1,2})(?:\.(\d{1,3}))?\]""".r

  /** LRC lyrics-file parse: each line is one or MORE `[mm:ss.xx]`
    * stamps followed by the line text (a multi-stamp line repeats
    * for every stamp — the compressed-chorus form); `[ar:]`/`[ti:]`
    * metadata tags and stampless lines contribute nothing. Duration
    * is 0 — LRC lines carry no span.
    */
  def parseLrc(s: String): Seq[Cue] = {
    val out = Seq.newBuilder[Cue]
    val matcher = LrcStamp.pattern.matcher("")
    for (raw <- s.linesIterator) {
      val line = raw.trim
      val stamps = scala.collection.mutable.ArrayBuffer.empty[Long]
      var at = 0
      var go = true
      // region + lookingAt: each stamp scans in place — a crafted
      // megabyte of back-to-back stamps must stay linear, never a
      // substring copy per stamp (review find r15)
      matcher.reset(line)
      while (go) {
        matcher.region(at, line.length)
        if (matcher.lookingAt()) {
          val f = matcher.group(3)
          val frac =
            if (f == null) 0L
            else f.length match {
              case 1 => f.toLong * 100
              case 2 => f.toLong * 10
              case _ => f.toLong
            }
          stamps += matcher.group(1).toLong * 60000L +
            matcher.group(2).toLong * 1000L + frac
          at = matcher.end
        } else go = false
      }
      val text = line.substring(at).trim
      if (text.nonEmpty) stamps.foreach(ms => out += Cue(0, ms, 0L, text))
    }
    out.result()
  }

  /** Does the payload look like an LRC lyrics file? (A `[mm:ss`
    * stamp at a line start within the head — metadata tags like
    * `[ar:...]` may precede it.)
    */
  private def isLrcText(b: Array[Byte]): Boolean = {
    val head = new String(b, 0, math.min(b.length, 512),
      java.nio.charset.StandardCharsets.UTF_8)
    head.stripPrefix("\uFEFF").linesIterator.take(20)
      .exists(l => LrcStamp.findPrefixMatchOf(l.trim).isDefined)
  }

  /** Does the payload look like a standalone ASS/SSA script? (The
    * `[Script Info]` section opener, past an optional BOM and `;`
    * comment lines — the layout every real script starts with.)
    */
  private def isAssText(b: Array[Byte]): Boolean = {
    val head = new String(b, 0, math.min(b.length, 512),
      java.nio.charset.StandardCharsets.UTF_8)
    head.stripPrefix("\uFEFF").linesIterator
      .map(_.trim)
      .find(l => l.nonEmpty && !l.startsWith(";"))
      .exists(_.equalsIgnoreCase("[Script Info]"))
  }

  /** Does the payload look like an SRT/WebVTT text file? (UTF-8 text
    * whose head carries a timing arrow or the WEBVTT magic.)
    */
  private def isSubtitleText(b: Array[Byte]): Boolean = {
    val head = new String(b, 0, math.min(b.length, 512),
      java.nio.charset.StandardCharsets.UTF_8)
    head.startsWith("WEBVTT") || head.contains("-->")
  }

  /** Cue rows for a media corpus: (doc_id, cue_idx, start_ms, dur_ms,
    * text) — Matroska subtitle tracks and bare SRT/VTT payloads both
    * land here; rows explode per cue in one batched map.
    */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val cues =
          if (b == null || b.length < 8) Nil
          else mkvCues(b).orElse(mp4Cues(b)).getOrElse {
            if (isAssText(b))
              parseAss(new String(b,
                java.nio.charset.StandardCharsets.UTF_8))
            // the anchored LRC stamp sniff is far stricter than the
            // '-->' substring scan and must win: an LRC lyric line
            // containing an arrow is still an LRC file (review find)
            else if (isLrcText(b))
              parseLrc(new String(b,
                java.nio.charset.StandardCharsets.UTF_8))
            else if (isSubtitleText(b))
              parseSrt(new String(b,
                java.nio.charset.StandardCharsets.UTF_8))
            else Nil
          }
        cues.zipWithIndex.map { case (c, i) =>
          (id, i, c.startMs, c.durMs, c.text)
        }
      }
      .toDF("doc_id", "cue_idx", "start_ms", "dur_ms", "text")
  }
}
