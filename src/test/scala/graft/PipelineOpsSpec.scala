package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

class PipelineOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("q52 repetition stats: ratios in [0,1], all docs present") {
    val r = PipelineOps.queries("q52_repetition_stats")(spark, sf)
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(r.count() == n)
    assert(r.filter($"dup_word_ratio" < 0 || $"dup_word_ratio" > 1 ||
      $"dup_2gram_ratio" < 0 || $"dup_2gram_ratio" > 1).count() == 0)
    // dup_2gram_ratio can never exceed dup_word_ratio's implied bound:
    // a doc with all-distinct words has all-distinct 2-grams
    assert(r.filter($"dup_word_ratio" === 0 && $"dup_2gram_ratio" > 0)
      .count() == 0)
  }

  test("q53 decontaminate: flagged docs really share a 4-gram with the eval set") {
    import graft.functions.{TextFns => T}
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", T.shinglesUdf(4)($"text").as("g"))
    val evalGrams = docs.filter($"doc_id" % 97 === 0)
      .select(explode($"g").as("gram")).distinct()
      .collect().map(_.getString(0)).toSet
    val flagged = PipelineOps.queries("q53_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recomputed = docs.filter($"doc_id" % 97 =!= 0).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[String](1).count(evalGrams.contains))
      .filter(_._2 > 0).toMap
    assert(flagged == recomputed)
  }

  test("q54 packing: every sequence fits the budget given its first doc") {
    val budget = 512
    val r = PipelineOps.queries("q54_pack_sequences")(spark, sf).collect()
    // concat-and-chunk: a sequence's START offset is < (seq_id+1)*budget,
    // and seq_ids are contiguous from 0 within each shard
    val byShard = r.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.head == 0 && ids.toSeq == (0L until ids.length).toSeq)
    }
    // total packed tokens == total corpus tokens (nothing dropped)
    val total = r.map(_.getAs[Long]("seq_tokens")).sum
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select(sum(size(graft.functions.TextFns.tokens($"text"))).cast("long"))
      .collect()(0).getLong(0)
    assert(total == corpus)
  }

  test("q55 stratified sample: en kept at ~50%, others at ~80%, deterministic") {
    val r1 = PipelineOps.queries("q55_stratified_sample")(spark, sf)
    val r2 = PipelineOps.queries("q55_stratified_sample")(spark, sf)
    assert(r1.collect().toSeq == r2.collect().toSeq) // stable across runs
    val kept = r1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept("en").toDouble / all("en")
    assert(enRate > 0.35 && enRate < 0.65, s"en rate $enRate")
    (all.keySet - "en").foreach { l =>
      val rate = kept(l).toDouble / all(l)
      assert(rate > 0.65 && rate < 0.95, s"$l rate $rate")
    }
  }

  test("q99 domain reweight: smallest source fully kept, rates monotone in size") {
    val r = PipelineOps.queries("q99_domain_reweight")(spark, sf).collect()
    assert(r.nonEmpty)
    val bySize = r.sortBy(_.getAs[Long]("tok_total"))
    // the anchor: the token-smallest source has thr = 1e6 => keeps all docs
    val smallest = bySize.head
    assert(smallest.getAs[Long]("thr") == 1000000L)
    assert(smallest.getAs[Long]("n_kept") == smallest.getAs[Long]("n_docs"))
    // temperature flattening: keep-rate never increases with source size
    val thrs = bySize.map(_.getAs[Long]("thr"))
    assert(thrs.zip(thrs.tail).forall { case (a, b) => b <= a },
      "thresholds must be non-increasing in source token mass")
    // kept counts are consistent with the threshold being a % filter
    r.foreach { row =>
      assert(row.getAs[Long]("n_kept") <= row.getAs[Long]("n_docs"))
      assert(row.getAs[Long]("kept_tokens") <= row.getAs[Long]("tok_total"))
    }
  }

  test("q100 span containment: reported pairs really share >= 5 fingerprints") {
    import graft.functions.{TextFns => T}
    val pairs = graft.operators.TextOps.queries("q100_span_containment")(spark, sf).collect()
    assert(pairs.nonEmpty, "synthetic corpus must contain copied spans")
    // independent recompute: fingerprint sets per doc via the same UDF,
    // then set-intersect in Scala (no df cap here, so the shared count
    // can only be >= the query's df-capped n_shared)
    val fpSets = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), T.rollingFingerprintsUdf(24, 4)(col("text")).as("fps"))
      .collect()
      .map(row => row.getLong(0) -> row.getSeq[Long](1).toSet).toMap
    pairs.foreach { row =>
      val (a, b, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val shared = fpSets(a).intersect(fpSets(b)).size
      assert(shared >= n, s"pair ($a,$b): uncapped shared $shared < reported $n")
      assert(n >= 5)
    }
  }

  test("ArrayAvgAgg ≡ posexplode elementwise mean (1e-12)") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val agg = e.groupBy($"label")
      .agg(graft.functions.ArrayAvgAgg.arrayAvg(64)($"embedding").as("c"))
      .collect().map(r => r.get(0).toString -> r.getSeq[Double](1)).toMap
    val ref = e.select($"label", posexplode($"embedding").as(Seq("p", "x")))
      .groupBy($"label", $"p").agg(avg($"x").as("cx"))
      .collect().groupBy(_.get(0).toString)
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    agg.foreach { case (l, c) =>
      c.zip(ref(l)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
  }
}
