package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for the engine's custom functions, so every
  * capability reachable from the Scala DataFrame API is also reachable from
  * plain `spark.sql(...)` (`cosine_fast` is injected separately as a native
  * expression by [[graft.GraftExtensions]]; these are the Scala-UDF tier).
  * Names are k/n-parameterized where the DataFrame API takes arguments —
  * SQL UDF registration binds concrete values. */
object SqlFunctions {
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("shingles3", TextFns.shinglesUdf(3))
    spark.udf.register("minhash_sig8", TextFns.minhashSigUdf(3, 8))
    spark.udf.register("simhash_fp3", TextFns.simhashFpUdf(3))
    spark.udf.register("rolling_fps8", TextFns.rollingFingerprintsUdf(8, 4))
    spark.udf.register("mime_parse", MimeParser.parseMimeUdf)
    spark.udf.register("html_to_text", MimeParser.htmlToTextUdf)
  }
}
