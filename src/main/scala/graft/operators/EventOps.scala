package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-stream batch analytics over the `events` table (round 5): the
  * product-analytics pair every event pipeline serves — ordered-sequence
  * funnels and cohort retention. Both are the batch duals of the streaming
  * correlation operators in `graft.streaming` (the reference's OTP flow is
  * itself a two-stage funnel: request → OTP arrival within a window;
  * cf. /root/reference/gmail-otp-listener/api/login_workflow.py:117).
  *
  * Scale posture: every step is a per-user aggregate (shuffle on user_id
  * with map-side combine) followed by joins of user-cardinality tables —
  * never an event×event self-join. At 100 TB the event table is the big
  * side exactly once per stage, and the per-user stage tables that chain
  * the funnel are orders of magnitude smaller (bounded by distinct users).
  */
object EventOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered-sequence funnel: first 'view', first 'click' AFTER that view,
    // first 'purchase' AFTER that click, per user; stage = how deep the
    // user got. The strict ts ordering is what makes this a funnel and not
    // three independent mins — each stage filters on the previous stage's
    // timestamp before aggregating.
    "q76_funnel_stages" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("view_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("click_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
      ev.select(col("user_id")).distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .withColumn("stage",
          when(col("purchase_ts").isNotNull, 3L)
            .when(col("click_ts").isNotNull, 2L)
            .when(col("view_ts").isNotNull, 1L)
            .otherwise(0L))
        .select(col("user_id"), col("view_ts"), col("click_ts"),
          col("purchase_ts"), col("stage"))
        .orderBy(col("user_id"))
    }),

    // Cohort retention: users bucketed by first-activity day, activity
    // counted per whole-week offset from that day. All calendar math is
    // INTEGER (datediff/7 floored) — no date_trunc('week') whose week-start
    // convention could differ between engines.
    "q77_retention_cohorts" -> ((s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val firstDay = act.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      act.join(firstDay, "user_id")
        .withColumn("week_offset",
          floor(datediff(col("day"), col("cohort_day")) / lit(7)).cast("long"))
        .groupBy(col("cohort_day"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_day"), col("week_offset"))
    }),

    // Volume-anomaly detection: flag days whose per-type event count
    // exceeds mean + 2σ of that type's daily history. The stats come from
    // INTEGER power sums (n_days, Σc, Σc²) — counts are exact, the power
    // sums stay in long arithmetic, and one identical IEEE expression
    // produces the threshold on both engines, so even the knife-edge
    // comparison is deterministic. The per-type stats table is tiny
    // (one row per event type) and broadcasts back onto the daily counts.
    "q87_event_anomaly" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val stats = daily.groupBy(col("event_type").as("et"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("n_events")).cast("long").as("sc"),
          sum(col("n_events") * col("n_events")).cast("long").as("scc"))
      val nd = col("n_days").cast("double")
      daily.join(broadcast(stats), col("event_type") === col("et"))
        .withColumn("mean_daily", col("sc").cast("double") / nd)
        .withColumn("sd_daily",
          sqrt((nd * col("scc").cast("double") -
            col("sc").cast("double") * col("sc").cast("double")) /
            (nd * (nd - lit(1.0)))))
        .select(col("event_type"), col("day"), col("n_events"),
          col("mean_daily"), col("sd_daily"),
          (col("n_events").cast("double") >
            col("mean_daily") + lit(2.0) * col("sd_daily")).as("is_spike"))
        .orderBy(col("event_type"), col("day"))
    }))

  def oracle: Map[String, String] = Map(
    "q76_funnel_stages" ->
      """WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS click_ts
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.view_ts
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
               GROUP BY e.user_id)
         SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
                     WHEN c.click_ts IS NOT NULL THEN 2
                     WHEN v.view_ts IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN v ON u.user_id = v.user_id
         LEFT JOIN c ON u.user_id = c.user_id
         LEFT JOIN p ON u.user_id = p.user_id
         ORDER BY u.user_id""",

    "q77_retention_cohorts" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                      FROM events),
         f AS (SELECT user_id, min(day) AS cohort_day FROM act
               GROUP BY user_id)
         SELECT f.cohort_day,
           CAST(floor(date_diff('day', f.cohort_day, act.day) / 7) AS BIGINT)
             AS week_offset,
           count(DISTINCT act.user_id) AS n_active
         FROM act JOIN f ON act.user_id = f.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q87_event_anomaly" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS n_events
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT event_type AS et, count(*) AS n_days,
             CAST(sum(n_events) AS BIGINT) AS sc,
             CAST(sum(n_events * n_events) AS BIGINT) AS scc
           FROM daily GROUP BY 1)
         SELECT event_type, day, n_events,
           CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_daily,
           sqrt((CAST(n_days AS DOUBLE) * CAST(scc AS DOUBLE)
             - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) /
             (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
             AS sd_daily,
           CAST(n_events AS DOUBLE) >
             CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)
             + 2.0 * sqrt((CAST(n_days AS DOUBLE) * CAST(scc AS DOUBLE)
               - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) /
               (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
             AS is_spike
         FROM daily JOIN stats ON event_type = et
         ORDER BY event_type, day""")
}
