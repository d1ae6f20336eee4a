package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Email/MBOX extraction: hand-authored RFC 5322/2045/2047 goldens,
  * encoded-word and transfer-encoding decodes, multipart preference,
  * mboxrd quoting, and hostile totality.
  */
class EmailSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("hand-authored bare message: headers, folding, year, plain body") {
    val raw = "From: Alice Doe <alice@example.org>\n" +
      "To: list@example.org\n" +
      "Subject: A folded\n" +
      "  subject line\n" +
      "Date: Tue, 3 Mar 2009 10:11:12 +0100\n" +
      "Content-Type: text/plain; charset=utf-8\n\n" +
      "Body line one.\nBody line two.\n"
    val Seq(m) = Email.messages(b(raw)).get
    assert(m.from.contains("Alice Doe <alice@example.org>"))
    assert(m.subject.contains("A folded subject line"), s"${m.subject}")
    assert(m.year.contains(2009))
    assert(m.text == "Body line one.\nBody line two.", s"[${m.text}]")
  }

  test("RFC 2047 encoded-words: B and Q forms, adjacent join, bad charset literal") {
    // '=?utf-8?Q?caf=C3=A9_r=C3=A9sum=C3=A9?=' and a base64 word
    val subj = Email.decodeWords(
      "=?utf-8?Q?caf=C3=A9_r=C3=A9sum=C3=A9?= and " +
        "=?utf-8?B?c8OpYW5jZQ==?=")
    assert(subj == "café résumé and séance", s"[$subj]")
    // adjacent encoded-words: intervening whitespace transparent
    assert(Email.decodeWords(
      "=?utf-8?Q?one?= =?utf-8?Q?_two?=") == "one two")
    // unresolvable charset stays literal
    assert(Email.decodeWords("=?x-nope-999?Q?abc?=")
      .contains("x-nope-999"))
  }

  test("transfer encodings: quoted-printable soft breaks and base64 bodies") {
    val qp = "From: a@b\nSubject: s\n" +
      "Content-Type: text/plain; charset=utf-8\n" +
      "Content-Transfer-Encoding: quoted-printable\n\n" +
      "caf=C3=A9 long line soft=\nbreak done=2E\n"
    val Seq(m1) = Email.messages(b(qp)).get
    assert(m1.text == "café long line softbreak done.", s"[${m1.text}]")
    val b64body = java.util.Base64.getMimeEncoder
      .encodeToString("päyload text".getBytes("UTF-8"))
    val b64 = "From: a@b\nSubject: s\n" +
      "Content-Type: text/plain; charset=utf-8\n" +
      "Content-Transfer-Encoding: base64\n\n" + b64body + "\n"
    val Seq(m2) = Email.messages(b(b64)).get
    assert(m2.text == "päyload text", s"[${m2.text}]")
  }

  test("multipart/alternative picks ONE part; mixed joins; html part extracts") {
    val alt = "From: a@b\nSubject: s\nMIME-Version: 1.0\n" +
      "Content-Type: multipart/alternative; boundary=\"XY\"\n\n" +
      "--XY\nContent-Type: text/plain\n\nthe plain text\n" +
      "--XY\nContent-Type: text/html\n\n" +
      "<html><body><p>the plain text</p></body></html>\n--XY--\n"
    val Seq(ma) = Email.messages(b(alt)).get
    assert(ma.text == "the plain text", s"[${ma.text}]")
    val mixed = "From: a@b\nSubject: s\n" +
      "Content-Type: multipart/mixed; boundary=ZZ\n\n" +
      "--ZZ\nContent-Type: text/plain\n\npart one\n" +
      "--ZZ\nContent-Type: application/octet-stream\n\nBINARYJUNK\n" +
      "--ZZ\nContent-Type: text/html\n\n" +
      "<html><body><p>part two html</p></body></html>\n--ZZ--\n"
    val Seq(mm) = Email.messages(b(mixed)).get
    assert(mm.text == "part one\npart two html", s"[${mm.text}]")
  }

  test("mbox: message split, mboxrd '>From ' unquoting, separator not text") {
    val mbox = "From alice@x Thu Jan  2 03:04:05 2010\n" +
      "From: alice@x\nSubject: first\nDate: Sat, 2 Jan 2010 00:00:00 +0000\n\n" +
      "body one\n>From quoted line stays\n\n" +
      "From bob@y Thu Jan  2 03:04:05 2011\n" +
      "From: bob@y\nSubject: second\nDate: Sun, 2 Jan 2011 00:00:00 +0000\n\n" +
      "body two\n\n"
    val ms = Email.messages(b(mbox)).get
    assert(ms.length == 2, s"$ms")
    assert(ms(0).subject.contains("first") && ms(0).year.contains(2010))
    assert(ms(0).text == "body one\nFrom quoted line stays",
      s"[${ms(0).text}]")
    assert(ms(1).subject.contains("second") &&
      ms(1).text == "body two")
  }

  test("round trip through encodeMbox across all four body shapes") {
    val msgs = (0 until 4).map(k =>
      (s"u$k@example.org", s"subject $k", 2000 + k, s"böd?y $k text"))
    val shapes = Map(0 -> "plain", 1 -> "qp", 2 -> "b64",
      3 -> "multipart")
    val mbox = Email.encodeMbox(msgs, shapes)
    val ms = Email.messages(mbox).get
    assert(ms.length == 4, s"${ms.length}")
    ms.zipWithIndex.foreach { case (m, k) =>
      assert(m.from.contains(s"u$k@example.org") &&
        m.subject.contains(s"subject $k") && m.year.contains(2000 + k) &&
        m.text == s"böd?y $k text", s"$k: $m")
    }
  }

  test("review pins: prose 'From ' no-sniff, duplicate-header fold, mid-line boundary") {
    // plain prose starting "From " must NOT sniff as an MBOX (it
    // would lose its first line and misclassify in the census)
    assert(Email.messages(b("From the archives of the society\n" +
      "we present a collection of texts.\nMore lines.")) == None)
    // a folded continuation of a DUPLICATE header must not append to
    // the first header's value
    val dup = "From: a@b\nSubject: Real\nSubject: Fake\n" +
      "  continued\nDate: Mon, 1 Jan 2001 00:00:00 +0000\n\nbody\n"
    val Seq(md) = Email.messages(b(dup)).get
    assert(md.subject.contains("Real"), s"${md.subject}")
    // '--boundary' INSIDE a line is content, not a delimiter
    val tricky = "From: a@b\nSubject: s\n" +
      "Content-Type: multipart/mixed; boundary=XY\n\n" +
      "--XY\nContent-Type: text/plain\n\n" +
      "see --XY mid-line stays\n" +
      "--XY--\n"
    val Seq(mt) = Email.messages(b(tricky)).get
    assert(mt.text == "see --XY mid-line stays", s"[${mt.text}]")
  }

  test("non-email returns None; table shape") {
    assert(Email.messages(b("just some text\nwith lines")) == None)
    assert(Email.messages(null) == None)
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val rows = Email.table(spark, Seq(
      (1L, Email.encodeMbox(Seq(("a@b", "s1", 2001, "t1"),
        ("c@d", "s2", 2002, "t2")))),
      (2L, "not mail".getBytes("UTF-8"))).toDF("doc_id", "media"))
      .orderBy("doc_id", "msg_idx").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(3) == "s1" && rows(1).getString(3) == "s2")
  }

  test("hostile totality: junk, truncations, bit flips never throw") {
    val base = Email.encodeMbox(Seq(
      ("a@b", "fuzz =?utf-8?Q?subj?=", 2003, "fuzz body")),
      _ => "multipart")
    val r = new scala.util.Random(79)
    for (cut <- 1 until base.length by 7) Email.messages(base.take(cut))
    for (_ <- 0 until 250) {
      val mut = base.clone()
      for (_ <- 0 to r.nextInt(5))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      Email.messages(mut)
    }
    Email.messages(Array.fill(256)('F'.toByte))
    // deep multipart nesting is depth-capped
    val nest = "From: a@b\nSubject: s\n" +
      (0 until 20).map(i => s"Content-Type: multipart/mixed; " +
        s"boundary=B$i\n\n--B$i\n").mkString
    Email.messages(b(nest))
  }
}
