package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFns => V}

class VectorFnsSpec extends SparkSpecBase {
  import spark.implicits._

  private val ab = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f))).toDF("a", "b")

  test("dot, dotExact, l2, norm agree with hand computation") {
    val r = ab.select(
      V.dot($"a", $"b").as("d"),
      V.dotExact($"a", $"b").as("de"),
      V.l2($"a", $"b").as("l2"),
      V.norm($"a").as("n")).collect()(0)
    assert(r.getDouble(0) == 12.0) // 4 - 10 + 18
    assert(r.getDouble(1) == 12.0)
    assert(math.abs(r.getDouble(2) - math.sqrt(9 + 49 + 9)) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(14)) < 1e-12)
  }

  test("cosine: self=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 0f), Seq(-1f, 0f))).toDF("a", "b")
      .select(V.cosine($"a", $"b").as("c"))
    val r = df.collect().map(_.getDouble(0))
    assert(math.abs(r(0) - 1.0) < 1e-12)
    assert(math.abs(r(1)) < 1e-12)
    assert(math.abs(r(2) + 1.0) < 1e-12)
  }

  test("cosineLshBucket: exact-×2-scaled vector lands in the same bucket (recall proof)") {
    val base = Seq(0.3f, -0.7f, 0.12f, 0.99f, -0.01f, 0.5f, -0.25f, 0.8f)
    val df = Seq(base, base.map(_ * 2.0f), base.map(x => -x)).toDF("v")
      .select(V.cosineLshBucket($"v", 16, dims = 8).as("b"))
    val r = df.collect().map(_.getLong(0))
    assert(r(0) == r(1))   // scaled copy: identical bucket, always
    assert(r(0) != r(2))   // antipode: different bucket (all bits flip)
  }

  test("cosine_fast codegen Expression ≡ HOF cosine (same fold order → bit-identical)") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val pairs = e.limit(20).select($"embedding".as("a"))
      .crossJoin(e.limit(20).select($"embedding".as("b")))
    val diff = pairs.select(
      V.cosine($"a", $"b").as("hof"),
      graft.functions.CosineExpr.cosineFast($"a", $"b").as("fast"))
      .filter(not($"hof" === $"fast"))
    assert(diff.count() == 0)
  }

  test("cosine_fast works through plain SQL (extension-registered function)") {
    graft.sources.Tables.embeddings(spark, sf).limit(3)
      .createOrReplaceTempView("emb_t")
    val r = spark.sql(
      "SELECT cosine_fast(embedding, embedding) AS s FROM emb_t").collect()
    assert(r.forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-12))
  }

  test("multimodal extractFeatures: per-partition decode yields normalized histograms") {
    import graft.operators.Multimodal
    val feats = Multimodal.extractFeatures(
      Multimodal.realMediaTable(spark, sf)).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.feature.length == 8)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3, s"doc ${f.doc_id} not normalized")
      assert(f.width >= 16 && f.height >= 1)
      if (f.media_type != "video") assert(f.n_frames == 1)
      else assert(f.n_frames >= 1 && f.n_frames <= 10)
    }
  }

  test("q42 assignCellUdf key ≡ distKey expression (UDF discipline: bit-equal)") {
    // same centroid geometry as the query: compare the expression-form
    // ordering key against the UDF's chosen cell on real vectors
    import graft.operators.VectorOps
    val e = graft.sources.Tables.embeddings(spark, sf)
    val iv = e.select($"vec_id",
      transform($"embedding", x =>
        (x.cast("string").cast(org.apache.spark.sql.types.DecimalType(18, 9)) *
          lit(1000000000L)).cast("long")).as("iv"))
    val cents = iv
      .withColumn("cell", pmod($"vec_id", lit(4)).cast("long"))
      .groupBy($"cell")
      .agg(graft.functions.ArrayLongSumAgg.arrayLongSum(64)($"iv").as("csum"),
        count(lit(1)).as("cn"))
      .persist()
    cents.count()
    // expression-form argmin via window over the cross join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"dkey", $"cell")
    val exprPick = iv.crossJoin(broadcast(cents))
      .withColumn("dkey", VectorOps.distKey($"iv", $"csum", $"cn"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"cell".as("expr_cell"))
    val udfPick = VectorOps.assignWithCentroids(iv, cents)
      .select($"vec_id", $"cell".as("udf_cell"))
    val diff = exprPick.join(udfPick, "vec_id")
      .filter($"expr_cell" =!= $"udf_cell")
    assert(diff.count() == 0)
  }

  test("q42 trained IVF: no label column referenced; recall vs exact top-k pinned") {
    val bf = graft.operators.VectorOps.dotTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.operators.VectorOps.ivfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 cells / nprobe 3 → blind probing would recover ~37.5% of the exact
    // top-k on this unclustered corpus; the trained quantizer recovers 60%
    // at sf0.001 — and deterministically so (every quantizer step is
    // exact-integer arithmetic), hence a fixed bound, not a flaky one.
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall $recall below pinned bound (measured 0.6)")
  }

  test("dotExact is the exact decimal sum regardless of float noise order") {
    // 64-dim vectors from the real table: exact-decimal dot must equal
    // numpy-style fold within 1e-9 (it IS exact, double cast at the end)
    val e = graft.sources.Tables.embeddings(spark, sf).limit(2)
      .select($"embedding").collect().map(_.getSeq[Float](0))
    // dotExact casts float→string→decimal (shortest round-trip repr), so
    // the reference computation mirrors that via Float.toString
    val expected = e(0).zip(e(1)).map { case (x, y) =>
      BigDecimal(x.toString).setScale(9, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(y.toString).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val got = Seq((e(0), e(1))).toDF("a", "b")
      .select(V.dotExact($"a", $"b").as("d")).collect()(0).getDouble(0)
    assert(math.abs(got - expected) < 1e-9)
  }

  test("fused integer-exact dot ≡ decimal-expression dot, bit for bit") {
    import graft.operators.VectorOps
    // every pair over a 40-vector slice of the real table: the fused
    // BigInt fold (the k-NN join's re-rank) must reproduce the decimal
    // HOF expression exactly — same HALF_UP round to scale 12, same
    // correctly-rounded double conversion
    val e = graft.sources.Tables.embeddings(spark, sf)
      .filter($"vec_id" < 40).select($"vec_id", $"embedding",
        VectorOps.intVecCol($"embedding").as("iv"))
    val a = e.select($"vec_id".as("ida"), $"embedding".as("va"), $"iv".as("iva"))
    val b = e.select($"vec_id".as("idb"), $"embedding".as("vb"), $"iv".as("ivb"))
    val mismatches = a.crossJoin(b)
      .filter(!(VectorOps.dotExactIv($"iva", $"ivb") <=> V.dotExact($"va", $"vb")))
      .count()
    assert(mismatches == 0L,
      s"$mismatches of 1600 pairs disagree between fused and expression dot")
  }

  test("fast rounding tail ≡ BigDecimal reference over randomized magnitudes") {
    import graft.operators.VectorOps
    // the pure-long divide-by-1e6 HALF_UP tail must agree with the
    // BigDecimal slow path bit-for-bit: ordinary magnitudes, the ×8
    // scaled-smoke range, exact half-boundary accumulators, negatives
    def reference(a: Seq[Long], b: Seq[Long]): Double = {
      var acc = BigInt(0)
      var i = 0
      while (i < a.length) { acc += BigInt(a(i)) * b(i); i += 1 }
      new java.math.BigDecimal(acc.bigInteger, 18)
        .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val rnd = new scala.util.Random(7L)
    def vec(scale: Long): Seq[Long] =
      Seq.fill(64)((rnd.nextLong() % 1000000000L) * scale)
    for (trial <- 0 until 400) {
      val s = if (trial % 3 == 2) 8L else 1L // the scaled-smoke range
      val (a, b) = (vec(s), vec(s))
      val fast = VectorOps.dotExactIvPure(a, b)
      val ref = reference(a, b)
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(ref),
        s"trial $trial: fast=$fast ref=$ref")
    }
    // rounding-boundary accumulators: Σ = q·1e6 + r with r ∈
    // {499999, 500000, 500001} exactly, positive and negative
    for (r <- Seq(499999L, 500000L, 500001L); sign <- Seq(1L, -1L)) {
      val target = sign * (123456789012345L * 1000000L + r)
      // one-element "vectors" multiplying to the target: a=target, b=1
      val fast = VectorOps.dotExactIvPure(Seq(target), Seq(1L))
      val ref = reference(Seq(target), Seq(1L))
      assert(java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(ref),
        s"boundary r=$r sign=$sign: fast=$fast ref=$ref")
    }
  }
}
