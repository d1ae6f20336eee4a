package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] Sitemap extraction (the sitemaps.org protocol) — the crawl
  * frontier's OTHER half next to [[Robots]]: robots.txt says where a
  * crawler may not go, the sitemap says where the site wants it to
  * go, with freshness hints that drive re-crawl scheduling. Three
  * public forms, all algorithmic:
  *
  *  - `<urlset>` XML: one `<url>` entry per page with `<loc>` (URL,
  *    XML-escaped per the protocol), optional `<lastmod>` (W3C date
  *    — the leading year is extracted alongside the raw string),
  *    optional `<priority>`.
  *  - `<sitemapindex>` XML: `<sitemap><loc>` pointers to child
  *    sitemaps — kind "index", so a pipeline can recurse.
  *  - plain-text sitemaps: one URL per line (the protocol's minimal
  *    form) — STRICT: every nonempty line must be a URL, or the
  *    payload is prose that happens to contain a link; an over-cap
  *    all-URL list caps like the XML path does.
  *
  * A `.gz` wrapper unwraps once (sitemaps ship gzipped routinely —
  * the census discipline's one-layer rule). Entry counts are capped
  * (the protocol itself caps a sitemap at 50,000 URLs); malformed
  * entries are skipped, never shifted. Scale shape: [[table]] is one
  * batched map, rows explode per entry, no shuffle.
  */
object Sitemaps {

  /** One sitemap entry; `kind` is "urlset", "index" or "text". */
  final case class Entry(kind: String, loc: String,
      lastmod: Option[String], year: Option[Int],
      priority: Option[Double])

  private val EntryCap = 50000 // the protocol's own per-file cap

  private def decodeEntities(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val (rep, next, _) = Html.entityAt(s, i)
        if (rep == null) { out += '&'; i += 1 }
        else { out ++= rep; i = next }
      } else { out += s.charAt(i); i += 1 }
    }
    out.toString
  }

  /** First `<tag>content</tag>` inside [from, to) of `s`, entity-
    * decoded and trimmed.
    */
  private def tagIn(s: String, tag: String, from: Int, to: Int)
      : Option[String] = {
    val open = s.indexOf("<" + tag, from)
    if (open < 0 || open >= to) return None
    val gt = s.indexOf('>', open)
    if (gt < 0 || gt >= to || s.charAt(gt - 1) == '/') return None
    val close = s.indexOf("</" + tag, gt + 1)
    if (close < 0 || close > to) return None
    val v = decodeEntities(s.substring(gt + 1, close)).trim
    if (v.isEmpty) None else Some(v)
  }

  private def yearOf(d: String): Option[Int] =
    Some(d.take(4)).filter(y => y.length == 4 && y.forall(_.isDigit))
      .map(_.toInt).filter(_ > 0)

  /** Parse one sitemap payload (XML urlset / XML index / plain text,
    * optionally gzipped); None when the bytes are none of the three.
    */
  def parse(b0: Array[Byte]): Option[Seq[Entry]] = try {
    if (b0 == null || b0.length < 8) return None
    val b = if (Warc.isGzip(b0))
      Warc.gunzip(b0, 1 << 26).getOrElse(return None)
    else b0
    if (Xml.isXml(b)) {
      val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      val (container, item, kind) =
        if (s.contains("<urlset")) ("urlset", "url", "urlset")
        else if (s.contains("<sitemapindex"))
          ("sitemapindex", "sitemap", "index")
        else return None
      val end = s.indexOf("</" + container) match {
        case -1 => s.length
        case e  => e
      }
      val out = Seq.newBuilder[Entry]
      var at = s.indexOf("<" + container)
      var n = 0
      while (at >= 0 && n < EntryCap) {
        val open = s.indexOf("<" + item, at)
        // the item name must end at a delimiter: "<url" must not
        // match "<urlset"
        if (open < 0 || open >= end) at = -1
        else if (open + 1 + item.length < s.length && {
          val c = s.charAt(open + 1 + item.length)
          !(c == '>' || c == ' ' || c == '\t' || c == '\n' || c == '\r')
        }) at = open + 1
        else {
          val close = s.indexOf("</" + item, open) match {
            case -1 => end
            case e  => math.min(e, end)
          }
          tagIn(s, "loc", open, close).foreach { loc =>
            val lm = tagIn(s, "lastmod", open, close)
            out += Entry(kind, loc, lm, lm.flatMap(yearOf),
              tagIn(s, "priority", open, close)
                .flatMap(_.toDoubleOption))
            n += 1
          }
          at = close
        }
      }
      if (n == 0) None else Some(out.result())
    } else {
      // plain-text form: one URL per line; only if the head looks
      // like a URL list at all
      val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      // the protocol's text form is ONLY urls: ANY nonempty
      // non-URL line means this is prose that happens to contain a
      // link; an over-cap all-URL list CAPS like the XML path does
      var nonUrl = false
      val urls = Seq.newBuilder[String]
      var n = 0
      for (raw <- s.linesIterator; l = raw.trim; if l.nonEmpty) {
        if (l.startsWith("http://") || l.startsWith("https://")) {
          if (n < EntryCap) { urls += l; n += 1 }
        } else nonUrl = true
      }
      val got = urls.result()
      if (nonUrl || got.isEmpty) None
      else Some(got.map(u => Entry("text", u, None, None, None)))
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Entry rows for a media corpus: (doc_id, entry_idx, kind, loc,
    * lastmod, year, priority) — one batched map, rows explode per
    * entry, non-sitemap payloads contribute nothing.
    */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        parse(b).getOrElse(Nil).zipWithIndex.map { case (e, i) =>
          (id, i, e.kind, e.loc, e.lastmod, e.year, e.priority)
        }
      }
      .toDF("doc_id", "entry_idx", "kind", "loc", "lastmod", "year",
        "priority")
  }

  /** Fixture writer: a protocol-shaped urlset / index document. */
  def encode(entries: Seq[(String, String, Double)],
      index: Boolean = false, gzipped: Boolean = false): Array[Byte] = {
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c   => c.toString
    }
    val (container, item) =
      if (index) ("sitemapindex", "sitemap") else ("urlset", "url")
    val body = entries.map { case (loc, lastmod, pri) =>
      s"<$item><loc>${esc(loc)}</loc>" +
        (if (lastmod != null && lastmod.nonEmpty)
          s"<lastmod>$lastmod</lastmod>" else "") +
        (if (!index && pri >= 0) s"<priority>$pri</priority>" else "") +
        s"</$item>"
    }.mkString
    val xml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      s"""<$container xmlns="http://www.sitemaps.org/schemas/""" +
      s"""sitemap/0.9">$body</$container>"""
    val raw = xml.getBytes("UTF-8")
    if (!gzipped) raw
    else {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write(raw); g.close(); o.toByteArray
    }
  }
}
