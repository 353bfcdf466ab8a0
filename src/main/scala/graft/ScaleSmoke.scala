package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke: replays the heavy dedup/similarity pipelines on an 8×
  * inflated corpus (sf0.1 unioned with shifted doc_ids → ~44k docs /
  * ~5.9M shingle-hashes) to check the SHAPE of the scaling, since real
  * multi-TB inputs don't exist in this container. What to look for: runtime
  * should grow ~linearly with corpus size for the map stages and with
  * candidate count for the joins — a quadratic blowup here means a bucket
  * key collapsed and the design is wrong. Run:
  *   sbt "runMain graft.ScaleSmoke /root/testdata/sf0.1 8"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{TextFns => T}
    import graft.sources.Tables

    // inflate: k copies with disjoint id ranges; texts repeat, which is
    // REALISTIC for a dedup workload (that's what dedup exists for) and
    // stresses the buckets harder than unique text would
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val big = (0 until mult).map(k =>
      base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        col("text"))).reduce(_ union _)
    val n = big.count()
    println(s"SCALE corpus=$n docs (${mult}x)")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.count()
      println(f"SCALE $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
      spark.catalog.clearCache()
    }

    // q48-shaped simhash near-dup at mult× (identical copies share fp —
    // the worst-case bucket load for this design)
    time("simhash_neardup") {
      val fp = Tables.spread(big)
        .select(col("doc_id"), T.simhashFpUdf(3)(col("text")).as("fp"))
        .filter(col("fp").isNotNull).persist()
      fp.count()
      // identical-fp groups explode quadratically by construction here
      // (every doc has mult-1 exact copies); dedupe to distinct fps for
      // candidate generation, then count group sizes — the production
      // shape for exact-duplicate-heavy corpora
      val groups = fp.groupBy(col("fp"))
        .agg(count(lit(1)).as("sz"), min(col("doc_id")).as("rep"))
        .persist()
      groups.count()
      val bands = groups.select(col("fp"), col("rep"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bkey", expr("(fp >> (band * 16)) & 65535"))
      val a = bands.alias("a"); val b = bands.alias("b")
      a.join(b, col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.rep") < col("b.rep"))
        .filter(T.hamming64(col("a.fp"), col("b.fp")) <= 3)
        .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b"))
        .distinct()
    }

    // q35-shaped minhash LSH candidates over distinct signatures
    time("minhash_lsh") {
      val sig = Tables.spread(big)
        .select(col("doc_id"), T.minhashSigUdf(3, 8)(col("text")).as("sig"))
        .filter(col("sig").isNotNull).persist()
      sig.count()
      val groups = sig.groupBy(col("sig"))
        .agg(min(col("doc_id")).as("rep")).persist()
      groups.count()
      val bands = groups.select(col("rep"),
          explode(T.bandKeys(col("sig"), 4, 2)).as("bk"))
        .select(col("rep"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      val a = bands.alias("a"); val b = bands.alias("b")
      a.join(b, col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.rep") < col("b.rep"))
        .select(col("a.rep").as("doc_a"), col("b.rep").as("doc_b"))
        .distinct()
    }

    // q58-shaped cluster assignment at mult×: signature-group pre-dedup
    // collapses the band-join input to DISTINCT signatures (reported
    // below as docs→reps), so pair enumeration cost is flat in the
    // duplicate multiplier — only the linear member-expansion joins grow
    time("dedup_clusters") {
      val wSig = org.apache.spark.sql.expressions.Window.partitionBy(col("skey"))
      val sigKeyed = Tables.spread(big)
        .select(col("doc_id"), T.minhashSigUdf(3, 8)(col("text")).as("sig"))
        .filter(col("sig").isNotNull)
        .withColumn("skey", concat_ws(",", col("sig")))
        .withColumn("rep", min(col("doc_id")).over(wSig))
        .persist()
      val nDocs = sigKeyed.count()
      val reps = sigKeyed.filter(col("doc_id") === col("rep"))
        .select(col("rep"), col("sig"))
        .persist()
      val nReps = reps.count()
      println(s"SCALE   band-join input: $nDocs docs -> $nReps reps")
      val bands = reps.select(col("rep"),
          explode(T.bandKeys(col("sig"), 4, 2)).as("bk"))
        .select(col("rep"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      val a = bands.alias("a"); val b = bands.alias("b")
      val pairs = a.join(b, col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.rep") < col("b.rep"))
        .select(col("a.rep").as("doc_a"), col("b.rep").as("doc_b"))
        .distinct()
      val edges = pairs.select(explode(array(
          struct(col("doc_a").as("a"), col("doc_b").as("b")),
          struct(col("doc_b").as("a"), col("doc_a").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .localCheckpoint()
      val labels = graft.operators.TextOps.minLabelPropagate(edges)
      big.select(col("doc_id"))
        .join(sigKeyed.select(col("doc_id"), col("rep")), Seq("doc_id"), "left")
        .join(labels, col("rep") === col("node"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("rep"), col("doc_id")).as("cluster"))
    }

    // exact dedup at mult× — hash groupBy, the baseline
    time("exact_dedup") {
      big.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep"), count(lit(1)).as("n"))
    }

    // q100-shaped winnowing span-containment at mult×: the dup-heavy
    // corpus is exactly what the df cap exists for — every fingerprint's
    // document frequency multiplies by the copy count, so without the
    // 2..50 df bound the fp self-join would blow up quadratically in
    // copies. Production shape mirrors q58's: collapse EXACT copies to a
    // representative first (one md5 groupBy), fingerprint only reps —
    // span analysis cost then scales with distinct text, not copies.
    time("span_containment") {
      val reps = big.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
        .persist()
      // n was counted up front — recounting `big` here would bill a full
      // corpus scan to this stage's clock just for the log line
      println(s"SCALE   fp input: $n docs -> ${reps.count()} reps")
      val fps = Tables.spread(reps)
        .select(col("doc_id"),
          explode(T.rollingFingerprintsUdf(24, 4)(col("text"))).as("fp"))
        .persist()
      fps.count()
      val rare = fps.groupBy(col("fp"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 50))
        .select(col("fp"))
      val f2 = fps.join(rare, Seq("fp"))
      val a = f2.alias("a"); val b = f2.alias("b")
      a.join(b, col("a.fp") === col("b.fp") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 5)
    }

    // Incremental cluster maintenance: bulk-load most of the corpus, then
    // measure a SMALL append batch and a retraction batch against the
    // stored state. The point of the design is that batch cost is
    // O(batch + affected members), not O(corpus) — so the small batches
    // must come in far under the bulk load despite the full-size state.
    {
      import graft.streaming.IncrementalDedup
      val stateDir = java.nio.file.Files
        .createTempDirectory("smoke_inc").toString
      val bulk = big.filter(pmod(col("doc_id"), lit(100)) < 97)
      val small = big.filter(pmod(col("doc_id"), lit(100)) === 97)
      def timed(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"SCALE $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      def fileBytes(): Long = {
        val st = org.apache.hadoop.fs.GlobalStorageStatistics.INSTANCE
          .get("file")
        if (st == null) 0L
        else Option(st.getLong("bytesRead")).map(_.longValue()).getOrElse(0L)
      }
      def dirBytes(p: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length()
          else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        walk(new java.io.File(p))
      }
      timed("inc_bulk_load") {
        IncrementalDedup.mergeBatch(bulk, 0L, stateDir)
      }
      timed("inc_small_append") {
        IncrementalDedup.mergeBatch(small, 1L, stateDir)
      }
      val stateBytes = dirBytes(stateDir)
      // a TINY batch (sub-bucket-count keys) is where the bucketed read
      // path shows: its lookups open only the handful of `_b` directories
      // the batch's keys hash into, instead of folding the whole state
      val t0bytes = fileBytes()
      timed("inc_tiny_append") {
        IncrementalDedup.mergeBatch(
          big.filter(pmod(col("doc_id"), lit(10000)) === 98), 2L, stateDir)
      }
      val tinyRead = fileBytes() - t0bytes
      // DEGENERATE batch (round-9 verdict task #7): ~2·B docs scattered
      // uniformly over the id space touch ≈ B(1−e^(−n/B)) ≈ 0.86·B of the
      // 64 buckets, so the pruned read necessarily approaches a full
      // fold — the B-vs-batch-size rule is that pruning pays off only
      // while distinct touched buckets ≪ B; beyond that the read cost
      // plateaus at the unpruned fold (never worse), which is the right
      // degradation for a maintainer whose common case is small batches.
      val s0bytes = fileBytes()
      timed("inc_scatter_append") {
        // %100==99 rows were never ingested (bulk <97, small ==97, tiny
        // %10000==98): a PURE append, so the measurement isolates the
        // scattered-read cost from the re-ingestion delete path
        IncrementalDedup.mergeBatch(
          big.filter(pmod(col("doc_id"), lit(100)) === 99 &&
            pmod(col("doc_id"), lit(3)) === 0), 3L, stateDir)
      }
      val scatterRead = fileBytes() - s0bytes
      if (stateBytes > 0)
        println(f"SCALE   pruned-read bytes vs state ($stateBytes):" +
          f" tiny=$tinyRead (${100.0 * tinyRead / stateBytes}%.1f%%)" +
          f" scatter=$scatterRead (${100.0 * scatterRead / stateBytes}%.1f%%)")
      timed("inc_retraction") {
        IncrementalDedup.mergeBatch(
          big.filter(pmod(col("doc_id"), lit(100)) === 0)
            .select(col("doc_id"), col("text"), lit("del").as("op")), 4L, stateDir)
      }
      spark.catalog.clearCache()
    }

    // distributed star CC above the union-find gate: every dedup stage's
    // edge list fits under the 4M gate at this SF, so force the
    // distributed O(log n) loop on a 5M-edge seeded random graph
    // (xxhash64-derived endpoints over 2M nodes — supercritical, one
    // giant component + tails) and time convergence. This is the path a
    // 100 TB corpus' rep-graph takes.
    {
      val t0 = System.nanoTime()
      val edges = spark.range(5000000L)
        .select(pmod(xxhash64(col("id")), lit(2000000L)).as("a"),
          pmod(xxhash64(col("id"), lit(1)), lit(2000000L)).as("b"))
      val labels = graft.operators.TextOps
        .minLabelPropagate(edges, localMaxEdges = 0L)
      val (nodes, comps) = {
        val r = labels.agg(count(lit(1)), countDistinct(col("label"))).first()
        (r.getLong(0), r.getLong(1))
      }
      println(f"SCALE star_cc_5m_edges   ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        s"nodes=$nodes components=$comps (forced distributed path)")
      spark.catalog.clearCache()
    }

    // micro-batch connector drain: 2M synthetic events through the DSv2
    // streaming source under admission control (maxPerTrigger 250k → 8
    // batches), counting rows via an aggregating foreachBatch. Measures
    // the source's per-batch overhead (offset planning + chunk-pruned
    // partitions + reader) isolated from any sink I/O.
    {
      val t0 = System.nanoTime()
      val total = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = spark.readStream.format("graftevents")
        .option("events", 2000000L).option("chunk", 65536)
        .option("maxPerTrigger", 250000L).load()
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("smoke_ev_ckpt").toString)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          total.addAndGet(b.count()); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(300000)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"SCALE stream_drain       $dt%8.2f s  rows=${total.get()} " +
        f"(${total.get() / dt / 1e6}%.2f M rows/s admitted in 250k batches)")
    }

    // IVF index lifecycle at mult×: train + write the partitioned index
    // (√N cells), then probe EXTERNAL query vectors and report how many
    // cell directories the pruned read actually opened — the number that
    // makes "a probe reads only its nprobe cells" a measurement instead
    // of a doc comment.
    {
      import graft.operators.VectorOps
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val bigE = (0 until mult).map(k =>
        e.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          col("embedding"))).reduce(_ union _)
      val idxPath = java.nio.file.Files
        .createTempDirectory("smoke_ivf").toString
      val nVecs = bigE.count()
      val t0 = System.nanoTime()
      VectorOps.writeIvfIndex(bigE, idxPath) // cells = 0 → √N auto
      val tw = (System.nanoTime() - t0) / 1e9
      // listFiles() is nullable (missing/unreadable dir) — a broken index
      // write should surface as cells=0 in the log line, not an NPE that
      // kills the rest of the smoke run
      val cells = Option(new java.io.File(
          s"${VectorOps.indexGenDir(spark, idxPath)}/corpus").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .count(_.getName.startsWith("cell="))
      println(f"SCALE ivf_write          $tw%8.2f s  cells=$cells " +
        s"(rows=$nVecs)")
      val queries = e.filter(col("vec_id") < 4L)
        .select(col("vec_id").as("qid"), col("embedding"))
      val t1 = System.nanoTime()
      val probed = VectorOps.probeIvfIndex(spark, idxPath, queries,
        k = 5, nprobe = 2)
      val rows = probed.count()
      val tp = (System.nanoTime() - t1) / 1e9
      // headOption: a plan-shape change (e.g. the scan moving to a V2
      // read path) must degrade to a labelled "metric unavailable" line,
      // not a NoSuchElementException mid-smoke
      probed.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("corpus")) => f
      }.headOption match {
        case Some(scan) =>
          val sel = scan.selectedPartitions.partitionCount
          // cells==0 (reachable since the listing null-guard) would make
          // the percentage NaN/Infinity — degrade to the same labelled
          // treatment as the None branch instead
          val pct = if (cells > 0) f"${100.0 * sel / cells}%.1f%%"
                    else "n/a (cell listing unavailable)"
          println(f"SCALE ivf_probe          $tp%8.2f s  rows=$rows  " +
            s"selected=$sel/$cells cells ($pct of the index)")
        case None =>
          println(f"SCALE ivf_probe          $tp%8.2f s  rows=$rows  " +
            "selected=?/"+ cells + " cells (no FileSourceScanExec over " +
            "corpus in the plan — prune metric unavailable)")
      }
      spark.catalog.clearCache()

      // k-NN JOIN through the stored index: every corpus vector × its
      // nprobe nearest cells, never all-pairs. Reported: the candidate
      // bound Σ_cells members·probers as a fraction of N² — the number
      // that proves "cell-bounded" is a measurement, not a doc comment.
      // (nprobe shrinks at big multipliers purely to keep the smoke's
      // wall-clock sane; the SHAPE — candidates ≈ nprobe/cells of N² —
      // is multiplier-invariant.)
      {
        val np = if (mult >= 32) 1 else 3
        val gen = VectorOps.indexGenDir(spark, idxPath)
        val stored = spark.read.parquet(s"$gen/corpus")
        val c2 = spark.read.parquet(s"$gen/centroids")
        val probers = stored
          .select(explode(VectorOps.probeCellsOf(c2, np)(col("iv")))
            .as("cell"))
          .groupBy(col("cell")).agg(count(lit(1)).as("p"))
        val members = stored.groupBy(col("cell")).agg(count(lit(1)).as("m"))
        val cand = members.join(probers, Seq("cell"))
          .agg(sum(col("m") * col("p"))).head().getLong(0)
        val t2 = System.nanoTime()
        val knnRows = VectorOps.ivfKnnJoinStored(spark, idxPath, k = 3,
          nprobe = np).count()
        val tk = (System.nanoTime() - t2) / 1e9
        val frac = 100.0 * cand / (nVecs.toDouble * nVecs)
        println(f"SCALE ivf_knn_join       $tk%8.2f s  rows=$knnRows  " +
          f"candidates=$cand ($frac%.2f%% of all-pairs, nprobe=$np)")
      }

      // PQ-ADC at the inflated scale: train the sub-codebooks, code the
      // corpus, score through lookup tables — the memory-bounded path.
      // The reported byte ratio is the layout's point: a scored corpus
      // row is 4 code ids, never the 64-float vector.
      {
        val t3 = System.nanoTime()
        val pqRows = VectorOps.pqAdcFrom(bigE, m = 4, subDim = 16,
          codewords = 16, nQueries = 5, k = 5).count()
        val tq = (System.nanoTime() - t3) / 1e9
        val codeBytes = nVecs * 4L * 8L
        val rawBytes = nVecs * 64L * 4L
        println(f"SCALE pq_adc             $tq%8.2f s  rows=$pqRows  " +
          f"code-bytes=$codeBytes (${100.0 * codeBytes / rawBytes}%.1f%% " +
          "of raw vectors)")
      }
      spark.catalog.clearCache()

      // IVFADC (q114's stored form): PQ codes attached to the written
      // index PARTITIONED BY the coarse cell, then an external-query
      // probe that ADC-scans only the probed cells' code files. The
      // reported fraction — codes bytes actually read / total codes
      // bytes — is the measurement behind "IVF prunes the ADC": flat PQ
      // reads 100% of codes per query batch, IVFADC reads ~nprobe/cells.
      {
        val t4 = System.nanoTime()
        VectorOps.writePqCodes(spark, idxPath, m = 4, subDim = 16,
          codewords = 16)
        val tw2 = (System.nanoTime() - t4) / 1e9
        val gen = VectorOps.indexGenDir(spark, idxPath)
        val codesTotal = {
          def sz(f: java.io.File): Long =
            if (f.isDirectory)
              Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
                .map(sz).sum
            else f.length()
          sz(new java.io.File(s"$gen/pq/codes"))
        }
        val t5 = System.nanoTime()
        val adc = VectorOps.probeIvfPqIndex(spark, idxPath, queries,
          k = 5, nprobe = 2, shortlist = 50)
        val adcRows = adc.count()
        val ta = (System.nanoTime() - t5) / 1e9
        adc.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.metadata.get("Location").exists(_.contains("codes")) => f
        }.headOption match {
          case Some(scan) =>
            val selBytes = scan.selectedPartitions.totalFileSize
            val pct = if (codesTotal > 0)
              f"${100.0 * selBytes / codesTotal}%.1f%%" else "n/a"
            println(f"SCALE ivfadc             $ta%8.2f s  rows=$adcRows  " +
              f"(pq-write $tw2%.2f s) codes-read=$selBytes/$codesTotal " +
              s"bytes ($pct of the codes table)")
          case None =>
            println(f"SCALE ivfadc             $ta%8.2f s  rows=$adcRows  " +
              f"(pq-write $tw2%.2f s) codes-read=?/$codesTotal bytes " +
              "(no FileSourceScanExec over codes — prune metric unavailable)")
        }
      }
      spark.catalog.clearCache()
    }

    // q43-shaped embedding near-dup at mult× (exact vector copies share a
    // hyperplane bucket — like the text stages, the worst bucket load)
    time("embedding_neardup") {
      import graft.functions.{VectorFns => V}
      val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      // even copies are identical (collapse into reps); odd copies are
      // ×(k+1)-scaled — DISTINCT vectors with cosine exactly 1 to their
      // source, so they survive the collapse and the verify stage must
      // recall them (rows > 0 proves the pair path end-to-end)
      val bigE = (0 until mult).map(k =>
        e.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          (if (k % 2 == 0) col("embedding")
           else transform(col("embedding"), x => x * lit((k + 1).toFloat)))
            .as("embedding"))).reduce(_ union _)
      // identical VECTORS collapse to a representative (the q58 move —
      // same vector ⟹ same bucket and same cosine to everything), so
      // bucket pairs are quadratic in DISTINCT vectors, not copies
      val groups = Tables.spread(bigE)
        .groupBy(col("embedding")).agg(min(col("vec_id")).as("rep"))
        .persist()
      println(s"SCALE   bucket-join input: ${bigE.count()} vecs -> " +
        s"${groups.count()} reps")
      val bk = groups
        .select(col("rep"), V.cosineLshBucket(col("embedding"), 16).as("bucket"))
      val cand = bk.select(col("rep").as("id_a"), col("bucket"))
        .join(bk.select(col("rep").as("id_b"), col("bucket")), Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .distinct()
      groups.select(col("rep").as("id_a"), col("embedding").as("v_a"))
        .join(broadcast(cand), "id_a")
        .join(groups.select(col("rep").as("id_b"),
          col("embedding").as("v_b")), "id_b")
        .filter(graft.functions.CosineExpr.cosineFast(col("v_a"), col("v_b")) >= 0.999)
        .select(col("id_a"), col("id_b"))
    }
    spark.stop()
  }
}
