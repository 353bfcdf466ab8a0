package graft

import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

class SinksSpec extends SparkSpecBase {
  import spark.implicits._

  test("partitioned parquet write → partition-pruned read (S7 layout)") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = Tables.documents(spark, sf)
    Sinks.writePartitioned(docs, out, Seq("lang"))
    // layout: one directory per lang
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.length >= 2, s"expected lang= dirs, got ${dirs.toSeq}")
    // a lang filter must become a PartitionFilter (pruning), not a data filter
    val back = spark.read.parquet(out).filter($"lang" === "en")
    val p = back.queryExecution.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"expected partition pruning:\n$p")
    assert(back.count() ==
      docs.filter($"lang" === "en").count())
    // full fidelity on the non-partition columns
    assert(back.agg(sum("n_chars")).collect()(0).getLong(0) ==
      docs.filter($"lang" === "en").agg(sum("n_chars")).collect()(0).getLong(0))
  }

  test("jdbcWriter builds a bounded-connection jdbc writer (S10, no DB here)") {
    val w = Sinks.jdbcWriter(Tables.nation(spark, sf), "jdbc:postgresql://db/x",
      "nation_out", numPartitions = 4)
    // no database in the container: assert it fails at CONNECT time (driver
    // lookup), i.e. the writer itself is fully formed
    val e = intercept[Exception] { w.mode("append").save() }
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.toLowerCase.contains("driver") ||
      msg.toLowerCase.contains("connect"), s"unexpected failure: $msg")
  }
}
