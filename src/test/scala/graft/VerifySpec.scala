package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the loud-failure contract of the correctness dump: a throwing
  * query must surface as a nonzero failure count (main then exits 1 with
  * a FAILED n/total summary), never degrade into a silently-missing
  * parquet dir that only the driver's absence-check might notice. */
class VerifySpec extends SparkSpecBase {

  test("Verify.run reports throwing queries as failures, dumps the rest") {
    val out = java.nio.file.Files.createTempDirectory("verify_fail").toString
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_query" -> ((s, _) => s.range(3).toDF("n")),
      "broken_query" -> ((s, _) => s.read.parquet("/nonexistent/graft/path")))
    val failed = Verify.run(spark, sf, out, qs)
    assert(failed == Seq("broken_query"),
      s"exactly the throwing query must be reported, got $failed")
    assert(new java.io.File(s"$out/ok_query").exists(),
      "healthy queries must still dump")
    assert(!new java.io.File(s"$out/broken_query").exists())
    // and a fully-green map reports no failures
    assert(Verify.run(spark, sf, out, qs - "broken_query").isEmpty)
  }
}
