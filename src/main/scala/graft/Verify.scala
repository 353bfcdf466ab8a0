package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump every query; returns the names that FAILED. Factored out of
    * main so a spec can drive it with a deliberately-broken query map and
    * assert the failure surfaces as a nonzero count (not just stderr). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame]
        = SparkEntry.queries): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    queries.toSeq.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // cap plan-description strings: a deeply-nested plan must never be
      // able to dominate wall time via explainString on each action
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // hostile-config sweeps (AQE off, broadcast threshold 0, odd
    // parallelism, ...): semicolon-separated k=v overrides — results must
    // be identical under ANY of them, which is what the sweeps verify.
    // A malformed entry (no '=') aborts up front NAMING the offender —
    // a MatchError here would kill the whole run with an opaque trace.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder.config(k, v)
          case _ => sys.exit {
            System.err.println(
              s"[verify] malformed SPARK_GRAFT_CONF entry (no '='): '$kv'")
            2
          }
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failed = run(spark, sfDir, outDir)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Loud failure: a thrown query must not degrade into a missing parquet
    // dir that only the driver's absence-check might notice.
    val total = SparkEntry.queries.size
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] FAILED ${failed.length}/$total: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    } else println(s"[verify] OK $total/$total queries dumped")
  }
}
