package graft

import org.apache.spark.sql.functions._
import graft.functions.{EmailFns => E}

/** FIXTURES.md §B3 cases over the codegen'd email scalar stack
  * (reference api/main.py:89-136 semantics). */
class EmailFnsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(col0: org.apache.spark.sql.Column, input: String): Any =
    Seq(input).toDF("s").select(col0.as("r")).collect()(0).get(0)

  test("E11 otp: 4-digit phrase, case-insensitive (main.py:131)") {
    assert(one(E.otp($"s"), "Hello! Your otp code is 1234. Bye") == "1234")
    assert(one(E.otp($"s"), "YOUR OTP CODE IS 9876") == "9876")
  }

  test("E11 otp: no match / 5-6 digit codes → null (FIXTURES B3.7)") {
    assert(one(E.otp($"s"), "no code here") == null)
    // \d{4} matches the first 4 of longer runs, same as Python re.search
    assert(one(E.otp($"s"), "Your otp code is 123456") == "1234")
  }

  test("E9/E10 forwarded From/To extraction (main.py:114-117)") {
    val body = "Forwarded message: From: Alice <real@sender.com> To: Bob <real@rcpt.com> hi"
    assert(one(E.forwardedFrom($"s"), body) == "real@sender.com")
    assert(one(E.forwardedTo($"s"), body) == "real@rcpt.com")
    assert(one(E.forwardedFrom($"s"), "plain body") == null)
  }

  test("E13 headerAddress strips display name (getaddresses analog)") {
    assert(one(E.headerAddress($"s"), "Zepto <no-reply@zepto.co.in>") == "no-reply@zepto.co.in")
    assert(one(E.headerAddress($"s"), "bare@example.com") == "bare@example.com")
  }

  test("E12 coalesce: body-derived wins over header (main.py:119-128)") {
    val df = Seq(("From: F <f@b.com> x", "Hdr <h@b.com>")).toDF("body", "hdr")
    val r = df.select(E.coalesceAddress(E.forwardedFrom($"body"),
      E.headerAddress($"hdr")).as("r")).collect()(0).getString(0)
    assert(r == "f@b.com")
    val df2 = Seq(("no forward", "Hdr <h@b.com>")).toDF("body", "hdr")
    val r2 = df2.select(E.coalesceAddress(E.forwardedFrom($"body"),
      E.headerAddress($"hdr")).as("r")).collect()(0).getString(0)
    assert(r2 == "h@b.com")
  }

  test("E14/E15 localPart + loginKey (main.py:182,303)") {
    val df = Seq("user42@example.com").toDF("to")
    val r = df.select(E.loginKey(lit("zepto"), E.localPart($"to")).as("k"))
      .collect()(0).getString(0)
    assert(r == "zepto_user42")
  }

  test("E1/E2 base64 decode, standard and URL-safe (main.py:167,242)") {
    val payload = """{"historyId": 123, "emailAddress": "a@b.com"}"""
    val std = java.util.Base64.getEncoder.encodeToString(payload.getBytes("UTF-8"))
    assert(one(E.b64ToString($"s"), std) == payload)
    // URL-safe alphabet: bytes chosen to produce '-' and '_' in the encoding
    val bytes = Array[Byte](-5, -17, 62, 63, -1, 0, 16)
    val url = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
    val decoded = one(E.urlSafeUnbase64($"s"), url).asInstanceOf[Array[Byte]]
    assert(decoded.toSeq == bytes.toSeq)
  }

  test("property: URL-safe base64 round-trips arbitrary byte arrays (E2)") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 50).map { _ =>
      Array.fill(rnd.nextInt(64) + 1)(rnd.nextInt(256).toByte)
    }
    val enc = cases.map(b =>
      java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b))
    val df = enc.toDF("s").select(E.urlSafeUnbase64($"s").as("b"))
    val decoded = df.collect().map(_.getAs[Array[Byte]](0).toSeq).toSeq
    assert(decoded == cases.map(_.toSeq))
  }

  test("E6 RFC-2822 date parse (main.py:94-95)") {
    val ts = one(E.rfc2822Date($"s"), "Tue, 2 Jan 2024 10:30:00 +0530")
      .asInstanceOf[java.sql.Timestamp]
    assert(ts.toInstant.toString == "2024-01-02T05:00:00Z")
  }

  test("E18 isoTimestamp formats like datetime.isoformat (main.py:203)") {
    val s = one(E.isoTimestamp(E.rfc2822Date($"s")),
      "Tue, 2 Jan 2024 10:30:00 +0000")
    assert(s == "2024-01-02T10:30:00") // session TZ is UTC
    // Python isoformat(timespec='auto'): six fractional digits iff
    // microsecond != 0 — datetime(...,500).isoformat() ends ".000500"
    val sub = Seq("2024-01-02 10:30:00.0005", "2024-01-02 10:30:00")
      .toDF("s").select(E.isoTimestamp(to_timestamp($"s")).as("i"))
      .collect().map(_.getString(0)).toSeq
    assert(sub == Seq("2024-01-02T10:30:00.000500", "2024-01-02T10:30:00"))
  }

  test("F4 freshness boundary: exactly at the window edge is fresh (main.py:96)") {
    val df = Seq(
      ("2024-01-01 10:00:00", "2024-01-01 10:02:00"), // exactly 2 min old
      ("2024-01-01 09:59:59", "2024-01-01 10:02:00")  // 2m01s old
    ).toDF("ts", "now")
      .select(to_timestamp($"ts").as("ts"), to_timestamp($"now").as("now"))
    val r = df.select(E.isFresh($"ts", $"now").as("f")).collect().map(_.getBoolean(0))
    assert(r.toSeq == Seq(true, false))
  }

  test("E8 stripHtml drops tags, script/style, entities") {
    val html = "<html><style>b{}</style><body><p>Your otp code is&nbsp;<b>4321</b></p>" +
      "<script>alert(1)</script></body></html>"
    assert(one(E.stripHtml($"s"), html) == "Your otp code is 4321")
  }
}
