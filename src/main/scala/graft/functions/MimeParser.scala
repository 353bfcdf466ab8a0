package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** MIME part: content type + decoded body. */
case class MimePart(contentType: String, body: String)

/** Parsed RFC-822 message: header map + flattened part list.
  * Mirrors the shape the reference gets from
  * `BytesParser(policy=default).parsebytes` (`api/main.py:91`). */
case class MimeMessage(headers: Map[String, String], parts: Seq[MimePart])

/** E5 — a hand-rolled RFC-822/MIME parser as a Scala UDF (SURVEY.md §2.10:
  * one of exactly two UDFs the engine needs; there is no Spark built-in).
  *
  * Scope: headers (unfolded), multipart boundary splitting (recursive),
  * quoted-printable and base64 content-transfer-encodings, charset-blind
  * UTF-8 decode. That covers every fixture shape in FIXTURES.md §B3 —
  * machine-generated OTP mail, not arbitrary wild MIME.
  *
  * Scale note: this runs per-row in an executor; it allocates only on the
  * row's own bytes and returns a struct, so it parallelizes embarrassingly.
  * It is deliberately NOT on any relational hot path — the oracle-checked
  * queries use the codegen'd [[EmailFns]] regex stack instead.
  */
object MimeParser extends Serializable {

  private def unfoldHeaders(raw: String): Map[String, String] =
    raw.replaceAll("\r\n", "\n")
      .replaceAll("\n[ \t]+", " ") // RFC-822 folded header continuation
      .split("\n")
      .iterator
      .filter(_.contains(":"))
      .map { line =>
        val i = line.indexOf(':')
        line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim
      }
      .toMap

  private def decodeBody(body: String, headers: Map[String, String]): String =
    headers.getOrElse("content-transfer-encoding", "").toLowerCase match {
      case "base64" =>
        try new String(
          java.util.Base64.getMimeDecoder.decode(body.replaceAll("\\s", "")),
          java.nio.charset.StandardCharsets.UTF_8)
        catch { case _: IllegalArgumentException => body }
      case "quoted-printable" =>
        val sb = new StringBuilder
        val s = body.replaceAll("=\r?\n", "") // soft line breaks
        var i = 0
        while (i < s.length) {
          val ch = s.charAt(i)
          if (ch == '=' && i + 3 <= s.length) {
            try {
              sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
              i += 3
            } catch { case _: Exception => sb.append(ch); i += 1 }
          } else { sb.append(ch); i += 1 }
        }
        sb.toString
      case _ => body
    }

  private def contentType(headers: Map[String, String]): String =
    headers.getOrElse("content-type", "text/plain").split(";")(0).trim.toLowerCase

  private def boundary(headers: Map[String, String]): Option[String] =
    headers.get("content-type").flatMap { ct =>
      "(?i)boundary=\"?([^\";]+)\"?".r.findFirstMatchIn(ct).map(_.group(1))
    }

  /** Recursive parse: returns (headers, flattened leaf parts). */
  def parse(raw: String): MimeMessage = {
    val normalized = raw.replaceAll("\r\n", "\n")
    val sep = normalized.indexOf("\n\n")
    val (headRaw, bodyRaw) =
      if (sep >= 0) (normalized.substring(0, sep), normalized.substring(sep + 2))
      else (normalized, "")
    val headers = unfoldHeaders(headRaw)
    val ct = contentType(headers)
    if (ct.startsWith("multipart/")) {
      boundary(headers) match {
        case Some(b) =>
          val parts = bodyRaw
            .split(java.util.regex.Pattern.quote("--" + b))
            .iterator
            .map(_.stripPrefix("\n").stripSuffix("\n"))
            .filter(p => p.nonEmpty && p != "--" && !p.startsWith("--"))
            .flatMap(p => parse(p).parts)
            .toSeq
          MimeMessage(headers, parts)
        case None => MimeMessage(headers, Seq(MimePart(ct, bodyRaw)))
      }
    } else {
      MimeMessage(headers, Seq(MimePart(ct, decodeBody(bodyRaw, headers))))
    }
  }

  /** F8 — first text/html part wins; anything else yields "" — the
    * reference only ever extracts from HTML bodies (multipart walk keeps
    * the first text/html, non-multipart is used iff html; main.py:100-108). */
  def htmlBody(msg: MimeMessage): String =
    msg.parts.find(_.contentType == "text/html").map(_.body).getOrElse("")

  /** The UDF surface: raw message string → struct(headers, parts). */
  val parseMimeUdf: UserDefinedFunction = udf((raw: String) =>
    if (raw == null) null else parse(raw))

  /** E8 (faithful path) — script/style-aware HTML→text as a UDF. */
  val htmlToTextUdf: UserDefinedFunction = udf((html: String) =>
    if (html == null) null
    else html
      .replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
      .replaceAll("(?i)<br[^>]*>", "\n")
      .replaceAll("<[^>]+>", " ")
      .replaceAll("&nbsp;", " ")
      .replaceAll("&amp;", "&")
      .replaceAll("&lt;", "<")
      .replaceAll("&gt;", ">")
      .replaceAll("&quot;", "\"")
      .replaceAll("&#39;", "'")
      .replaceAll("[ \\t\\u00a0]+", " ")
      .trim)

  def parseMime(c: Column): Column = parseMimeUdf(c)
  def htmlToText(c: Column): Column = htmlToTextUdf(c)
}
