package graft.ext

/** [EXT] The shared document-text dispatch: one place that routes a
  * payload through every text extractor this engine owns (HTML → PDF
  * → DOCX/EPUB → RTF → email), used by the archive walkers
  * ([[Warc.docTable]], [[Tar.docTable]]) so "container member →
  * corpus text" behaves identically regardless of which container
  * carried the bytes. A gzipped member unwraps once (the census
  * discipline).
  */
object Documents {

  /** (text, refused) when the payload is a recognized document. */
  def dispatch(b: Array[Byte]): Option[(String, Long)] = {
    if (b == null || b.length < 6) return None
    val inner =
      if (Warc.isGzip(b)) Warc.gunzip(b, 1 << 26).getOrElse(b)
      else b
    Html.text(inner).map(h => (h.text, h.refused))
      .orElse(Pdf.text(inner)
        .map(p => (p.pages.mkString("\n"), p.refused)))
      .orElse(Office.text(inner).map(o => (o.text, o.refused)))
      .orElse(Rtf.text(inner).map(t => (t.text, 0L)))
      .orElse(Email.messages(inner).map(ms =>
        (ms.map(_.text).filter(_.nonEmpty).mkString("\n"), 0L)))
      .orElse(Xml.text(inner).map(t => (t.text, t.refused)))
  }
}
