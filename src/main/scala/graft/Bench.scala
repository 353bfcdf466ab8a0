package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * local[32] + 32 shuffle partitions by default (matches the container's
  * cores); AQE on so joins re-plan at runtime like they would on a cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // cap plan-description strings: a deeply-nested plan must never be
      // able to dominate wall time via explainString on each action
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen spin-up and parquet footer reads would otherwise
    // all land on the first timed query (~6 s measured on q01). (Caching
    // the tables was tried and measured slower at this scale: in-memory
    // columnar→row scan loses to the vectorized parquet reader on
    // OS-page-cached small files.)
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach {
      t => graft.sources.Tables(spark, sfDir, t).count()
    }
    // min of two timed executions per query, taken from two INTERLEAVED
    // full passes (pass 1 over every query, then pass 2): single-shot
    // numbers on this box vary ±20% run-to-run (JIT/GC/scheduler noise)
    // and the round-7 driver artifact showed one-off 7-9x ambient stalls
    // (q101 12.6s vs 1.45s quiet, zero code delta). Back-to-back
    // repetitions of the SAME query sit inside one stall window, so both
    // samples get polluted together; interleaving puts the two samples
    // ~half the suite apart in time, which no single stall spans — the min
    // is then a trustworthy steady-state estimate per query.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop-format write materializes every output column through the
      // full physical plan (count() would let Catalyst prune unreferenced
      // projections and drop sorts, under-measuring projection-heavy
      // queries).
      val ok = try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true
      } catch {
        case e: Throwable =>
          errors(name) = e.toString.replaceAll("[\"\\\\\n\r]", " ").take(200)
          false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // the LSH queries persist intermediates; drop them so repeated
      // executions measure the query, not a growing cache
      spark.catalog.clearCache()
      if (ok) dt else -1.0 // failed queries report negative, never a "pass"
    }
    // Untimed warm-up pass over every query FIRST: JIT compilation, codegen
    // class loading, and page-cache population otherwise land entirely in
    // timed pass 1 (round-8 pass_totals were [122.8, 73.0] — pass 1 was
    // warm-up in disguise, so "min of two" degenerated into "take pass 2").
    // With both timed passes warm, the min is a genuine noise filter and
    // pass_totals are comparable run-health indicators.
    named.foreach { case (n, fn) => timeOne(n, fn) }
    errors.clear() // warm-up failures re-diagnose in the timed passes
    val passes = (1 to 2).map(_ => named.map { case (n, fn) => timeOne(n, fn) })
    val results = named.map(_._1).zipWithIndex.map { case (name, i) =>
      val ts = passes.map(_(i))
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // pass_totals = each pass's honest wall time (the min-total understates
    // a real run; the gate uses the per-query mins, humans can read both)
    val passTotals = passes.map(_.filter(_ >= 0).sum)
      .mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","pass_totals":$passTotals,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // The driver records only the tail of stdout, which truncates the
    // per-query map once it outgrows the window — so ALSO persist the
    // complete map to the repo root. tools/bench_gate.py reads this file
    // (current vs last committed version) to gate regressions over every
    // query, not just the ones that fit in the tail. The repo root is
    // detected by the build.sbt marker (cwd when launched via sbt) with
    // an env override — a silent write to some other cwd would leave the
    // gate comparing a STALE file.
    try {
      val dir = sys.env.get("SPARK_GRAFT_BENCH_DIR")
        .orElse(Option(".").filter(_ =>
          java.nio.file.Files.exists(java.nio.file.Paths.get("build.sbt"))))
      dir match {
        case Some(d) => java.nio.file.Files.write(
          java.nio.file.Paths.get(d, "BENCH_full.json"),
          (line + "\n").getBytes("UTF-8"))
        case None => System.err.println(
          "BENCH_full.json not written: cwd is not the repo root " +
            "(no build.sbt) and SPARK_GRAFT_BENCH_DIR is unset")
      }
    }
    catch { case e: Throwable => System.err.println(s"BENCH_full.json write failed: $e") }
    spark.stop()
  }
}
