package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** A/B timer + shuffle-volume meter for the as-of join at an inflated
  * corpus: the native merge plan (graft.plans.AsofJoin) vs the
  * union+window composition (the q29 shape), both fetching the SAME
  * three right-side payload columns. The union form must null-pad
  * every shuffled row to the union of both schemas — including the
  * wide right payload on every LEFT row — and replay one
  * last(ignoreNulls) window per fetched column; the native plan ships
  * each side narrow. AQE stays off so the exchange metrics are
  * readable from the executed plan.
  * Usage: runMain graft.AsofProbe [sfDir] [mult]. */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables

    val ev = Tables.events(spark, sfDir)
    def inflate(df: DataFrame, uid: String, eid: String): DataFrame =
      (0 until mult).map(i =>
        df.withColumn(uid, col(uid) + lit(i * 10000000L))
          .withColumn(eid, col(eid) + lit(i * 100000000L)))
        .reduce(_ union _)
    val left = inflate(ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")),
      "user_id", "event_id").cache()
    val right = inflate(ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"), col("value").as("click_value"),
        col("props").as("click_props")), "c_user", "click_id").cache()
    println(s"left=${left.count()} right=${right.count()} rows")

    def nativeForm(): DataFrame =
      graft.plans.AsofJoin(left, right, Seq("user_id"), Seq("c_user"),
        "ts", "click_ts", rightTie = Seq(col("click_id")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("click_id"), col("click_ts"), col("click_value"),
          col("click_props"))

    def windowForm(): DataFrame = {
      val l = left.select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("long").as("click_id"),
        lit(null).cast("timestamp").as("click_ts"),
        lit(null).cast("double").as("click_value"),
        lit(null).cast("string").as("click_props"), lit(1).as("kind"))
      val r = right.select(col("c_user").as("user_id"),
        col("click_ts").as("ts"), col("click_id").as("event_id"),
        col("click_id"), col("click_ts"), col("click_value"),
        col("click_props"), lit(0).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      r.union(l)
        .withColumn("m_id", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("m_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .withColumn("m_value", last(col("click_value"), ignoreNulls = true).over(w))
        .withColumn("m_props", last(col("click_props"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("m_id").as("click_id"), col("m_ts").as("click_ts"),
          col("m_value").as("click_value"), col("m_props").as("click_props"))
    }

    def run(tag: String, mk: () => DataFrame): Long = {
      val df = mk()
      val t0 = System.nanoTime()
      val n = df.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      val ex = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e }
      val bytes = ex.map(_.metrics.get("dataSize").map(_.value).getOrElse(0L)).sum
      val recs = ex.map(_.metrics.get("shuffleRecordsWritten")
        .map(_.value).getOrElse(0L)).sum
      println(f"ASOF $tag%-8s $sec%8.2f s rows=$n shuffle=${bytes / 1e6}%9.1f MB records=$recs%12d exchanges=${ex.length}")
      n
    }
    // the two forms must agree row-for-row before any timing matters
    val a = nativeForm().collect().map(_.toSeq).toSet
    val b = windowForm().collect().map(_.toSeq).toSet
    require(a == b, s"forms diverged: extra=${(a -- b).take(2)} " +
      s"missing=${(b -- a).take(2)}")
    println(s"forms agree on ${a.size} rows")
    val n1 = run("native", nativeForm)
    val n2 = run("window", windowForm)
    val n3 = run("native2", nativeForm)
    val n4 = run("window2", windowForm)
    require(Set(n1, n2, n3, n4).size == 1, "row counts diverged")
    spark.stop()
  }
}
