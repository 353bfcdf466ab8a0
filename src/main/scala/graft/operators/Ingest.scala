package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.functions.{EmailFns => E}
import graft.functions.Exact._

/** Batch analogs of the reference's ingestion pipeline (SURVEY.md §3.1),
  * expressed over the `events` table standing in for the Gmail/Pub-Sub
  * notification stream. The streaming (Structured Streaming) forms of the
  * same semantics live in `graft.streaming`; these batch forms are the
  * oracle-verifiable surface.
  */
object Ingest {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P2/E3 — JSON field pluck + typed aggregate (main.py:243-246).
    // Integer sums are exact in both engines; no decimal gymnastics needed.
    "q20_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
        .orderBy(col("event_type"))
    }),

    // A1 — per-key running-max watermark (main.py:269-290 generalized).
    "q21_watermark_max" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(col("event_id")).as("watermark"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // F2 — monotone-guard dedup: emit only events that advance the per-user
    // running max of `value` (the reference's stale-historyId drop,
    // main.py:269-273, as a window computation — one shuffle on user_id).
    "q22_monotone_guard" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("prev_max", max(col("value")).over(w))
        .filter(col("prev_max").isNull || col("value") > col("prev_max"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .orderBy(col("event_id"))
    }),

    // F4/ST2 — event-time freshness window, pinned to max(ts) so it is
    // deterministic (SURVEY.md §7.5). The scalar max broadcasts.
    "q23_freshness_filter" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val maxTs = ev.agg(max(col("ts")).as("max_ts"))
      ev.join(broadcast(maxTs))
        .filter(E.isFresh(col("ts"), col("max_ts"), "INTERVAL 2 HOURS"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    // T1/S3 — latest event per key (row_number over desc ts).
    "q24_latest_per_user" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .orderBy(col("user_id"))
    }),

    // E19 — the reference's only generator-shaped op: flatten nested
    // history[].messagesAdded[] (main.py:292-294), reconstructed here as a
    // two-level nested array built from event fields, then
    // explode(flatten(...)). Generators run inside WSCG — no shuffle.
    "q18_flatten_explode" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("k",
          pmod(get_json_object(col("props"), "$.k").cast("long"), lit(5)) + 1)
        .withColumn("history",
          transform(sequence(lit(1), col("k")), i =>
            struct(array(struct((col("event_id") * 100 + i).as("msg_id")))
              .as("messagesAdded"))))
      ev.select(col("event_id"),
          explode(flatten(col("history.messagesAdded"))).as("m"))
        .select(col("event_id"), col("m.msg_id").as("msg_id"))
        .orderBy(col("msg_id"))
    }),

    // E20 — dict merge/update (login_workflow.py:61-68): map literals +
    // map_concat, verified through scalar extraction (cross-engine MAP
    // hashing is not portable; the values are).
    "q19_map_merge" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("m1",
          map(lit("k"), get_json_object(col("props"), "$.k")))
        .withColumn("m2",
          map(lit("platform"), lit("zepto"), lit("env"), lit("Production")))
        .withColumn("merged", map_concat(col("m1"), col("m2")))
        .select(col("event_id"),
          element_at(col("merged"), "k").as("k_val"),
          element_at(col("merged"), "platform").as("platform"),
          size(col("merged")).cast("long").as("n_keys"))
        .orderBy(col("event_id"))
    }),

    // E3/E11/E14/E15/F5/P4 — the OTP extraction spine: synthesize the
    // email-ish text deterministically from event fields, then run the
    // reference's exact regex/key pipeline (main.py:89-136,180-194,301-307).
    "q25_otp_pipeline" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("msg",
          when(col("event_type") === "signup",
            concat(lit("Your otp code is "), lpad(col("k").cast("string"), 4, "0")))
          .otherwise(lit("no verification code in this message")))
        .withColumn("to_email",
          concat(lit("user"), col("user_id").cast("string"), lit("@example.com")))
      ev.withColumn("otp", E.otp(col("msg")))
        .withColumn("platform", lit("zepto"))
        .withColumn("username", E.localPart(col("to_email")))
        .withColumn("login_key", E.loginKey(col("platform"), col("username")))
        .filter(col("otp").isNotNull)
        .select(col("event_id"), col("login_key"), col("otp"))
        .orderBy(col("event_id"))
    }),

    // ST3 analog — gap-based sessionization (30-min inactivity), the batch
    // equivalent of session_window; lag + running-sum-of-flags pattern.
    "q26_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 30L * 60 * 1000000,
            lit(1)).otherwise(lit(0)))
        .withColumn("session_id",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // ST5 — tumbling daily window aggregation (batch form of
    // groupBy(window($"ts", "1 day"))).
    "q27_tumbling_daily" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_value"))
        .orderBy(col("day"), col("event_type"))
    }),

    // E6/E9-E15 — the full ParsedEmail projection (main.py:89-136) on
    // synthesized header/body columns: forwarded-body addresses override
    // headers (coalesce lattice), OTP nullable, constant platform.
    "q28_email_parse" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("header_from", lit("Zepto <no-reply@zepto.co.in>"))
        .withColumn("header_to",
          concat(col("c_name"), lit(" <user"), col("c_custkey").cast("string"),
            lit("@example.com>")))
        .withColumn("body",
          concat(
            when(col("c_custkey") % 3 === 0,
              concat(lit("Forwarded message: From: Fwd Sender <fwd"),
                col("c_custkey").cast("string"), lit("@relay.example.com> ")))
              .otherwise(lit("")),
            when(col("c_custkey") % 2 === 0,
              concat(lit("Hello. Your otp code is "),
                lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
                lit(" — do not share it.")))
              .otherwise(lit("Hello. There is no code here."))))
      c.select(
          col("c_custkey"),
          E.coalesceAddress(E.forwardedFrom(col("body")),
            E.headerAddress(col("header_from"))).as("from_email"),
          E.coalesceAddress(E.forwardedTo(col("body")),
            E.headerAddress(col("header_to"))).as("to_email"),
          E.otp(col("body")).as("otp"),
          lit("zepto").as("platform"))
        .orderBy(col("c_custkey"))
    }),

    // S1/E1/E3/P2/F1 — the complete Pub/Sub envelope decode (main.py:
    // 235-252): base64-wrapped JSON payload → unbase64 → from_json with an
    // explicit schema → field plucks → null-guard on historyId. The
    // envelope is synthesized from event fields so the whole decode chain
    // is oracle-checkable (DuckDB from_base64 mirrors unbase64).
    "q49_pubsub_envelope" -> ((s, d) => {
      val payloadJson = concat(lit("{\"historyId\": "), col("event_id"),
        lit(", \"emailAddress\": \"user"), col("user_id"),
        lit("@example.com\"}"))
      val envelope = Tables.spread(Tables.events(s, d))
        .withColumn("data_b64", base64(encode(payloadJson, "UTF-8")))
      val schema = org.apache.spark.sql.types.StructType
        .fromDDL("historyId BIGINT, emailAddress STRING")
      envelope
        .withColumn("decoded", E.b64ToString(col("data_b64")))
        .withColumn("msg", from_json(col("decoded"), schema))
        .select(col("event_id"),
          col("msg.historyId").as("history_id"),
          col("msg.emailAddress").as("email_address"))
        .filter(col("history_id").isNotNull) // F1 null-guard
        .orderBy(col("event_id"))
    }),

    // E5/E8 — the two UDFs end-to-end: synthesize a full RFC-822 message
    // per customer, run the real MIME parser + HTML→text UDFs, extract the
    // ParsedEmail fields. The oracle recomputes the expected values from
    // the raw columns with plain SQL — so the UDFs are verified against an
    // independent implementation, not themselves.
    "q44_mime_udf_pipeline" -> ((s, d) => {
      import graft.functions.MimeParser
      val raw = Tables.spread(Tables.customer(s, d)).withColumn("raw_email", concat(
        lit("From: Zepto <no-reply@zepto.co.in>\n"),
        lit("To: "), col("c_name"), lit(" <user"),
        col("c_custkey").cast("string"), lit("@example.com>\n"),
        lit("Date: Tue, 2 Jan 2024 10:30:00 +0000\n"),
        lit("Content-Type: text/html; charset=utf-8\n\n"),
        lit("<html><body><p>Your otp code is "),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
        lit("</p><br><span>thanks</span></body></html>")))
      raw.withColumn("mime", MimeParser.parseMime(col("raw_email")))
        .withColumn("body_text",
          MimeParser.htmlToText(element_at(col("mime.parts"), 1)
            .getField("body")))
        .select(col("c_custkey"),
          E.headerAddress(element_at(col("mime.headers"), "from"))
            .as("from_email"),
          E.headerAddress(element_at(col("mime.headers"), "to"))
            .as("to_email"),
          E.otp(col("body_text")).as("otp"),
          E.rfc2822Date(element_at(col("mime.headers"), "date"))
            .as("email_ts"))
        .orderBy(col("c_custkey"))
    }),

    // J1 batch analog — keyed as-of join: for each purchase, the most
    // recent click by the same user at-or-before its timestamp,
    // declared through THE as-of surface (graft.syntax.asofJoin →
    // AsofJoinNode): the engine picks merge vs broadcast stats-driven,
    // so this and q117 are one user API with two physical paths (both
    // plan-pinned in AsofJoinSpec). Until round 13 this query was the
    // hand-built union + last_value(ignoreNulls) window form — kept
    // green by the unchanged oracle, which replays exactly that window
    // plan in DuckDB, proving the two forms agree row-for-row.
    "q29_asof_join" -> ((s, d) => {
      import graft.syntax._
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      purchases.asofJoin(clicks, Seq("user_id"), Seq("c_user"),
          "ts", "click_ts", rightTie = Seq(col("click_id")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("click_id"), col("click_ts"))
        .orderBy(col("event_id"))
    }),

    // q29's semantics through the NATIVE as-of join (graft/plans/
    // AsofJoin.scala — tier-(c): Spark has no as-of join). Unlike the
    // union+window form, each side shuffles its OWN narrow schema (no
    // null-padding to the union schema) and the merge fetches the whole
    // matched right row in one pass — here three click columns, where
    // the window form replays one last(ignoreNulls) per fetched column.
    "q117_native_asof" -> ((s, d) => {
      import graft.syntax._
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      purchases.asofJoin(clicks, Seq("user_id"), Seq("c_user"),
          "ts", "click_ts", rightTie = Seq(col("click_id")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("click_id"), col("click_ts"), col("click_value"))
        .orderBy(col("event_id"))
    }))

  def oracle: Map[String, String] = Map(
    "q18_flatten_explode" ->
      """SELECT event_id, event_id * 100 + i AS msg_id FROM (
           SELECT event_id,
             unnest(generate_series(1,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 + 1)) AS i
           FROM events) t ORDER BY msg_id""",

    "q19_map_merge" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_val,
           'zepto' AS platform, CAST(3 AS BIGINT) AS n_keys
         FROM events ORDER BY event_id""",

    "q20_json_extract" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / count(json_extract_string(props, '$.k')) AS avg_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q21_watermark_max" ->
      """SELECT user_id, max(event_id) AS watermark, count(*) AS n_events
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q22_monotone_guard" ->
      """SELECT event_id, user_id, ts, value FROM (
           SELECT event_id, user_id, ts, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
           FROM events) t
         WHERE prev_max IS NULL OR value > prev_max ORDER BY event_id""",

    "q23_freshness_filter" ->
      """SELECT event_id, user_id, ts, event_type FROM events
         WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
         ORDER BY event_id""",

    "q24_latest_per_user" ->
      """SELECT user_id, event_id, ts, event_type FROM (
           SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t
         WHERE rn = 1 ORDER BY user_id""",

    "q25_otp_pipeline" ->
      """SELECT event_id,
           concat_ws('_', 'zepto',
             split_part('user' || CAST(user_id AS VARCHAR) || '@example.com',
               '@', 1)) AS login_key,
           nullif(regexp_extract(
             CASE WHEN event_type = 'signup'
               THEN 'Your otp code is ' ||
                 lpad(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS VARCHAR), 4, '0')
               ELSE 'no verification code in this message' END,
             '(?i)Your otp code is (\d{4})', 1), '') AS otp
         FROM events
         WHERE nullif(regexp_extract(
             CASE WHEN event_type = 'signup'
               THEN 'Your otp code is ' ||
                 lpad(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS VARCHAR), 4, '0')
               ELSE 'no verification code in this message' END,
             '(?i)Your otp code is (\d{4})', 1), '') IS NOT NULL
         ORDER BY event_id""",

    "q26_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT user_id, ts,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
         FROM sessions GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    "q27_tumbling_daily" ->
      """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
             AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",

    "q28_email_parse" ->
      """WITH built AS (
           SELECT c_custkey,
             'Zepto <no-reply@zepto.co.in>' AS header_from,
             c_name || ' <user' || CAST(c_custkey AS VARCHAR)
               || '@example.com>' AS header_to,
             (CASE WHEN c_custkey % 3 = 0
               THEN 'Forwarded message: From: Fwd Sender <fwd'
                 || CAST(c_custkey AS VARCHAR) || '@relay.example.com> '
               ELSE '' END) ||
             (CASE WHEN c_custkey % 2 = 0
               THEN 'Hello. Your otp code is '
                 || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                 || ' — do not share it.'
               ELSE 'Hello. There is no code here.' END) AS body
           FROM customer)
         SELECT c_custkey,
           coalesce(nullif(regexp_extract(body, 'From:\s[^<]*<(\S+@\S+)>', 1), ''),
             nullif(regexp_extract(header_from, '<?([^<>\s]+@[^<>\s]+?)>?$', 1), ''))
             AS from_email,
           coalesce(nullif(regexp_extract(body, 'To:\s[^<]*<(\S+@\S+)>', 1), ''),
             nullif(regexp_extract(header_to, '<?([^<>\s]+@[^<>\s]+?)>?$', 1), ''))
             AS to_email,
           nullif(regexp_extract(body, '(?i)Your otp code is (\d{4})', 1), '') AS otp,
           'zepto' AS platform
         FROM built ORDER BY c_custkey""",

    "q49_pubsub_envelope" ->
      """WITH env AS (
           SELECT event_id,
             to_base64(encode('{"historyId": ' || CAST(event_id AS VARCHAR)
               || ', "emailAddress": "user' || CAST(user_id AS VARCHAR)
               || '@example.com"}')) AS data_b64
           FROM events),
         dec AS (
           SELECT event_id, decode(from_base64(data_b64)) AS decoded FROM env)
         SELECT event_id,
           CAST(json_extract_string(decoded, '$.historyId') AS BIGINT)
             AS history_id,
           json_extract_string(decoded, '$.emailAddress') AS email_address
         FROM dec
         WHERE json_extract_string(decoded, '$.historyId') IS NOT NULL
         ORDER BY event_id""",

    "q44_mime_udf_pipeline" ->
      """SELECT c_custkey,
           'no-reply@zepto.co.in' AS from_email,
           'user' || CAST(c_custkey AS VARCHAR) || '@example.com' AS to_email,
           lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS otp,
           TIMESTAMP '2024-01-02 10:30:00' AS email_ts
         FROM customer ORDER BY c_custkey""",

    "q29_asof_join" ->
      """WITH u AS (
           SELECT user_id, ts, event_id, 0 AS kind FROM events
           WHERE event_type = 'click'
           UNION ALL
           SELECT user_id, ts, event_id, 1 AS kind FROM events
           WHERE event_type = 'purchase'),
         w AS (
           SELECT user_id, ts, event_id, kind,
             last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
               OVER win AS click_id,
             last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
               OVER win AS click_ts
           FROM u
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, kind, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, user_id, ts, click_id, click_ts FROM w
         WHERE kind = 1 ORDER BY event_id""",

    "q117_native_asof" ->
      """SELECT p.event_id, p.user_id, p.ts,
           c.click_id, c.click_ts, c.click_value
         FROM (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase') p
         LEFT JOIN LATERAL (
           SELECT event_id AS click_id, ts AS click_ts,
             value AS click_value
           FROM events c
           WHERE c.event_type = 'click' AND c.user_id = p.user_id
             AND c.ts <= p.ts
           ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON true
         ORDER BY p.event_id""")
}
