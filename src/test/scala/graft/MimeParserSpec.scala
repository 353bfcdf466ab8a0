package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MimeParser

/** FIXTURES.md §B3 fixtures against the E5 MIME UDF core (pure JVM — no
  * Spark needed for the parse logic itself). */
class MimeParserSpec extends AnyFunSuite {

  private val simpleHtml =
    """From: Zepto <no-reply@zepto.co.in>
      |To: Buyer <user1@example.com>
      |Date: Tue, 2 Jan 2024 10:30:00 +0000
      |Content-Type: text/html; charset=utf-8
      |
      |<html><body>Your otp code is 1234</body></html>""".stripMargin

  test("B3.1 simple HTML email: headers + single html part") {
    val m = MimeParser.parse(simpleHtml)
    assert(m.headers("from") == "Zepto <no-reply@zepto.co.in>")
    assert(m.headers("to") == "Buyer <user1@example.com>")
    assert(m.parts.map(_.contentType) == Seq("text/html"))
    assert(MimeParser.htmlBody(m).contains("Your otp code is 1234"))
  }

  test("B3.2 multipart/alternative: html part wins over plain (main.py:100-105)") {
    val mp =
      """From: a@b.com
        |Content-Type: multipart/alternative; boundary="XYZ"
        |
        |--XYZ
        |Content-Type: text/plain
        |
        |plain version
        |--XYZ
        |Content-Type: text/html
        |
        |<p>html version</p>
        |--XYZ--""".stripMargin
    val m = MimeParser.parse(mp)
    assert(m.parts.map(_.contentType).toSet == Set("text/plain", "text/html"))
    assert(MimeParser.htmlBody(m).contains("html version"))
  }

  test("B3.6 non-HTML single part: htmlBody empty (main.py:106-108)") {
    val plain = "Content-Type: text/plain\n\njust text"
    val m = MimeParser.parse(plain)
    assert(m.parts.map(_.contentType) == Seq("text/plain"))
    assert(MimeParser.htmlBody(m) == "")
  }

  test("folded headers are unfolded (RFC-822 continuation)") {
    val folded = "Subject: a very\n long subject\nFrom: x@y.com\n\nbody"
    val m = MimeParser.parse(folded)
    assert(m.headers("subject") == "a very long subject")
  }

  test("quoted-printable body decodes (incl. soft breaks)") {
    val qp = "Content-Type: text/html\nContent-Transfer-Encoding: quoted-printable\n\n" +
      "Your otp =\ncode is 56=3D78"
    val m = MimeParser.parse(qp)
    assert(m.parts.head.body == "Your otp code is 56=78")
  }

  test("base64 body decodes") {
    val b = java.util.Base64.getEncoder.encodeToString(
      "<b>Your otp code is 7777</b>".getBytes("UTF-8"))
    val m = MimeParser.parse(s"Content-Type: text/html\nContent-Transfer-Encoding: base64\n\n$b")
    assert(m.parts.head.body == "<b>Your otp code is 7777</b>")
  }

  test("htmlToText UDF core strips script/style and entities") {
    val f = (html: String) => html
      .replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    assert(!f("<script>x</script>ok").contains("x"))
  }
}
