package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFns => T}

class TextFnsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokens drops empties") {
    val r = Seq("a  b c ").toDF("t").select(T.tokens($"t").as("w"))
      .collect()(0).getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
  }

  test("shingles: k-grams, distinct, short docs → empty") {
    val df = Seq("a b c d", "a b").toDF("t").select(T.tokens($"t").as("w"))
    val r = df.select(T.shingles($"w", 3).as("s")).collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1).isEmpty)
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq(("a b c", "a b c"), ("a b", "c d")).toDF("x", "y")
      .select(T.shingles(T.tokens($"x"), 1).as("sx"),
        T.shingles(T.tokens($"y"), 1).as("sy"))
    val r = df.select(T.jaccard($"sx", $"sy").as("j")).collect().map(_.getDouble(0))
    assert(r(0) == 1.0 && r(1) == 0.0)
  }

  test("minhash: identical docs → identical signatures; band keys collide") {
    val df = Seq(("d1", "the quick brown fox jumps over the lazy dog"),
      ("d2", "the quick brown fox jumps over the lazy dog"),
      ("d3", "completely different content with other words entirely"))
      .toDF("id", "t")
      .select($"id", T.minhashSignature(T.shingles(T.tokens($"t"), 2), 8).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sigs("d1") == sigs("d2"))
    assert(sigs("d1") != sigs("d3"))
  }

  test("simhash: identical → hamming 0; different → large hamming") {
    val df = Seq(("same words here ok", "same words here ok"),
      ("same words here ok", "totally other tokens now"))
      .toDF("x", "y")
      .select(T.simhash64(T.tokens($"x")).as("hx"), T.simhash64(T.tokens($"y")).as("hy"))
    val r = df.select(T.hamming64($"hx", $"hy").as("d")).collect()
      .map(_.getAs[Number](0).longValue)
    assert(r(0) == 0L)
    assert(r(1) > 8L)
  }

  test("shinglesUdf ≡ shingles HOF expression (the UDF is the fast path)") {
    val df = graft.sources.Tables.documents(spark, sf).limit(50)
    val cmp = df.select(
      T.shingles(T.tokens($"text"), 3).as("hof"),
      T.shinglesUdf(3)($"text").as("udf"))
    assert(cmp.filter(not($"hof" === $"udf")).count() == 0)
  }

  test("minhashKmUdf ≡ minhashSignatureKM HOF expression") {
    val df = graft.sources.Tables.documents(spark, sf).limit(50)
      .select(T.shinglesUdf(3)($"text").as("sh"))
      .filter(size($"sh") > 0)
    val cmp = df.select(
      T.minhashSignatureKM($"sh", 8).as("hof"),
      T.minhashKmUdf(8)($"sh").as("udf"))
    assert(cmp.filter(not($"hof" === $"udf")).count() == 0)
  }

  test("minhashSigUdf ≡ minhashKmUdf∘shinglesUdf (fused single-pass form)") {
    val df = graft.sources.Tables.documents(spark, sf).limit(50)
    val cmp = df.select(
      T.minhashKmUdf(8)(T.shinglesUdf(3)($"text")).as("staged"),
      T.minhashSigUdf(3, 8)($"text").as("fused"))
      .filter(size($"staged") > 0)
    assert(cmp.filter(not($"staged" === $"fused")).count() == 0)
  }

  test("shingleSigUdf ≡ (shinglesUdf, minhashKmUdf) pair") {
    val df = graft.sources.Tables.documents(spark, sf).limit(50)
    val cmp = df.select(
      T.shinglesUdf(3)($"text").as("sh"),
      T.minhashKmUdf(8)(T.shinglesUdf(3)($"text")).as("sig"),
      T.shingleSigUdf(3, 8)($"text").as("ss"))
      .filter(size($"sh") > 0)
    assert(cmp.filter(not($"sh" === $"ss.shingles") ||
      not($"sig" === $"ss.sig")).count() == 0)
  }

  test("simhashFpUdf ≡ simhash64FromHashes∘xxhash64∘shinglesUdf (fused form)") {
    val df = graft.sources.Tables.documents(spark, sf).limit(50)
      .filter(size(T.shinglesUdf(3)($"text")) > 0)
    val cmp = df.select(
      T.simhash64FromHashes(
        transform(T.shinglesUdf(3)($"text"), w => xxhash64(w))).as("staged"),
      T.simhashFpUdf(3)($"text").as("fused"))
    assert(cmp.filter($"staged" =!= $"fused").count() == 0)
  }

  test("q48 simhash near-dup: planted exact dups are all recalled; hamming bound holds") {
    val result = graft.operators.TextOps.simhashNearDupPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 10 === 0 && size(T.tokens($"text")) >= 3)
      .select($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    assert(planted.subsetOf(result),
      s"missing planted pairs: ${planted -- result}")
    // the registered q48 audit form must agree: every planted pair recalled
    val audit = graft.operators.TextOps.queries("q48_simhash_neardup")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(2)))
    assert(audit.map(_._1).toSet == planted)
    assert(audit.forall(_._2), "audit row with recalled=false")
    // every reported pair really is within hamming 3 (recompute independently)
    val fps = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", T.simhash64FromHashes(
        transform(T.shinglesUdf(3)($"text"), w => xxhash64(w))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = fps ++ fps.collect { case (id, fp) if id % 10 == 0 => (id + 1000000L) -> fp }
    result.foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(full(a) ^ full(b)) <= 3, s"pair ($a,$b)")
    }
  }

  test("langIdHeuristic picks marker-majority language, und on no hits") {
    val markers = Map("en" -> Seq("the", "and"), "es" -> Seq("el", "la"))
    val df = Seq("the cat and the dog", "el gato la casa", "xyzzy plugh")
      .toDF("t").select(T.langIdHeuristic(T.tokens($"t"), markers).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "es", "und"))
  }
}
