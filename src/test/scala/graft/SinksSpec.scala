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

  test("jdbcWriter round-trips rows through an embedded Derby database (S10)") {
    // Derby ships in /opt/spark/jars (Spark's metastore dependency), so
    // the JDBC sink can be verified end-to-end without a network database:
    // write via the bounded-connection writer, read back via spark.read.jdbc
    val db = java.nio.file.Files.createTempDirectory("graft_derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val nation = Tables.nation(spark, sf)
      .select($"n_nationkey".cast("long").as("k"), $"n_name",
        $"n_regionkey".cast("long").as("rk"))
    Sinks.jdbcWriter(nation, url, "nation_out", numPartitions = 2)
      .option("driver", driver).mode("overwrite").save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nation_out")
      .option("driver", driver).load()
      .select($"k".cast("long"), $"n_name", $"rk".cast("long"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      nation.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet,
      "JDBC write → read must preserve every row")
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
