package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level re-expression of the reference's email-parsing scalar stack
  * (SURVEY.md §2.8, reference `gmail-otp-listener/api/main.py:89-136`).
  *
  * Everything here is a composition of codegen'd built-ins — no UDFs — so
  * the whole parse pipeline stays inside whole-stage codegen and is a pure
  * `select(...)` at any scale. The two genuinely non-relational pieces
  * (full MIME multipart parse, robust HTML stripping) live in
  * [[MimeParser]] as UDFs and are kept off the relational hot path.
  */
object EmailFns {

  /** E1 — standard base64 decode to UTF-8 string (main.py:242). */
  def b64ToString(c: Column): Column = unbase64(c).cast("string")

  /** E2 — URL-safe base64 decode (main.py:167). Spark's `unbase64` is
    * RFC-2045 only, so translate the URL-safe alphabet first. */
  def urlSafeUnbase64(c: Column): Column = unbase64(translate(c, "-_", "+/"))

  /** E8 (cheap path) — strip HTML tags and collapse entities/whitespace
    * (main.py:110-111). Good enough for machine-generated OTP emails; the
    * faithful DOM-aware version is `MimeParser.htmlToText`. */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noScript, "<[^>]+>", " ")
    val entities = regexp_replace(
      regexp_replace(
        regexp_replace(noTags, "&nbsp;", " "),
        "&amp;", "&"),
      "&(lt|gt|quot|#39);", " ")
    trim(regexp_replace(entities, "\\s+", " "))
  }

  /** E9 — forwarded-body `From:` address (main.py:114,116); null if absent. */
  def forwardedFrom(text: Column): Column =
    nullIfEmpty(regexp_extract(text, "From:\\s[^<]*<(\\S+@\\S+)>", 1))

  /** E10 — forwarded-body `To:` address (main.py:115,117). */
  def forwardedTo(text: Column): Column =
    nullIfEmpty(regexp_extract(text, "To:\\s[^<]*<(\\S+@\\S+)>", 1))

  /** E11 — the OTP itself: case-insensitive, exactly 4 digits
    * (main.py:131-132). `regexp_extract` returns "" on miss, the reference
    * returns None — hence the nullif wrapper. */
  def otp(text: Column): Column =
    nullIfEmpty(regexp_extract(text, "(?i)Your otp code is (\\d{4})", 1))

  /** E13 — address out of an RFC-5322 header value, display name stripped
    * (`getaddresses`, main.py:121-128). */
  def headerAddress(hdr: Column): Column =
    nullIfEmpty(regexp_extract(hdr, "<?([^<>\\s]+@[^<>\\s]+?)>?$", 1))

  /** E12 — body-derived address wins over header-derived (main.py:119-128). */
  def coalesceAddress(bodyDerived: Column, headerDerived: Column): Column =
    coalesce(bodyDerived, headerDerived)

  /** E14 — username = local part of the to-address (main.py:303). */
  def localPart(email: Column): Column = substring_index(email, "@", 1)

  /** E15 — correlation key `{platform}_{username}` (main.py:182). */
  def loginKey(platform: Column, username: Column): Column =
    concat_ws("_", platform, username)

  /** E6 — RFC-2822 Date header → timestamp (main.py:94-95). Spark 4's
    * parser rejects day-of-week patterns (`EEE`), and RFC-2822 makes the
    * weekday optional/redundant — so strip it before parsing. */
  def rfc2822Date(c: Column): Column =
    to_timestamp(regexp_replace(c, "^[A-Za-z]{3},\\s*", ""),
      "d MMM yyyy HH:mm:ss Z")

  /** E18 — ISO-8601 timestamp formatting, the `datetime.isoformat()` of
    * the reference's token-expiry bookkeeping (main.py:203). Python's
    * isoformat(timespec='auto') appends exactly six fractional digits
    * when microsecond != 0 and none otherwise — mirror both branches so
    * sub-second expiries reproduce the reference output byte-for-byte. */
  def isoTimestamp(ts: Column): Column =
    when(date_format(ts, "SSSSSS") === "000000",
      date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"))
    .otherwise(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))

  /** F4/ST2 — event-time freshness: ts within `window` of `now` (main.py:96).
    * In batch/oracle contexts pass a deterministic `now` (e.g. max(ts)). */
  def isFresh(ts: Column, now: Column, window: String = "INTERVAL 2 MINUTES"): Column =
    ts >= now - expr(window)

  /** "" → null, matching the reference's None-returning regex extracts. */
  def nullIfEmpty(c: Column): Column = nullif(c, lit(""))
}
