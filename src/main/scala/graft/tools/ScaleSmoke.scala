package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke: amplify the sf0.1 fixtures N× at runtime (key-shifted
  * unions, so join fan-outs stay realistic) and time the core operator
  * shapes at 1× and N×. The point is catching anything that does NOT
  * scale linearly — driver-side state, accidental broadcasts of big
  * sides, quadratic candidate generation — before a real cluster does.
  */
/** Row shape fed to the MemoryStream throughput probe. */
case class SmokeEv(event_id: Long, ts: java.sql.Timestamp,
    event_type: String, value: Double)

object ScaleSmoke {
  private def amplify(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame = {
    val shift = 10000000L
    (0 until n).map { i =>
      keyCols.foldLeft(df)((d, k) =>
        d.withColumn(k, col(k) + lit(i * shift)))
    }.reduce(_ union _)
  }

  /** Optional label-substring filter: SPARK_GRAFT_SMOKE_ONLY=minhash
    * runs just the matching shapes (targeted re-measurement). */
  private val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")

  private def time(label: String)(f: => Long): Unit =
    if (only.exists(o => !label.contains(o))) ()
    else {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_AMPLIFY", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)

    for (mult <- Seq(1, n)) {
      val li = amplify(t.lineitem, Seq("l_orderkey"), mult)
      val ord = amplify(t.orders, Seq("o_orderkey", "o_custkey"), mult)
      val ev = amplify(t.events, Seq("event_id", "user_id"), mult)
      println(s"--- amplification ${mult}x ---")
      time(s"scan_filter_count")(
        li.filter(col("l_quantity") > 30.0).count())
      time(s"groupby_hash")(
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity"))).count())
      time(s"shuffle_join_agg")(
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_extendedprice"))).count())
      time(s"topk")(
        spark.sparkContext.parallelize(
          ord.orderBy(col("o_totalprice").desc).limit(25).collect().toSeq.map(_.getLong(0))).count())
      time(s"window_running_sum")(
        ev.withColumn("r", sum(col("value")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
            .rowsBetween(Long.MinValue, 0))).count())
      // interval-overlap join (q203's shape): copies share the date
      // range, so TRUE overlap pairs grow with both sides' mass (output
      // mass, the containment/q42 argument); the bin equi-join bounds
      // candidate work by bin width — never an unbounded theta join.
      time(s"interval_join") {
        val a = li.filter(col("l_quantity") >= 49 &&
            col("l_orderkey") % 10 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_shipdate").as("a_start"),
            expr("timestampadd(DAY, l_linenumber * 10, l_shipdate)")
              .as("a_end"))
        val b = ord.filter(col("o_orderkey") % 997 === 0)
          .select(col("o_orderkey"), col("o_orderdate").as("b_start"),
            expr("timestampadd(DAY, 14, o_orderdate)").as("b_end"))
        val n = graft.operators.Joins.intervalOverlapJoinFrom(a, b).count()
        println(s"[scale]   interval join: pairs=$n")
        n
      }
      // hierarchy rollup (q204's shape): one log2(n)-bounded ancestor
      // explode + one aggregate — time must track input mass linearly
      // with NO depth-iterative join loop to regress.
      time(s"hierarchy_rollup") {
        val parts = (0 until mult).map { i =>
          t.part.select((col("p_partkey") + lit(i * 10000000L))
            .as("p_partkey"),
            expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"))
        }.reduce(_ union _)
        graft.operators.Relational.hierarchyRollupFrom(parts).count()
      }
      // LLM-pipeline north-star ops: mutate text per copy so amplified
      // docs are near- but not exact dups (the hard case for LSH)
      val docs = (0 until mult).map { i =>
        t.documents.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" copyvariant$i tail")).as("text"))
      }.reduce(_ union _)
      time(s"minhash_lsh_dedup") {
        val r = graft.operators.Dedup.minhashLshSummaryFrom(docs).head()
        println(s"[scale]   minhash funnel: docs=${r.getLong(0)} " +
          s"candidates=${r.getLong(1)} dups=${r.getLong(2)}")
        r.getLong(0)
      }
      time(s"winnow_fingerprints") {
        // per-doc interpreted-HOF path: must scale linearly in corpus size
        graft.operators.Dedup.winnowFingerprintsFrom(docs)
          .agg(sum(col("n_fp"))).head().getLong(0)
      }
      // quality perceptron (q218's shape): per round one margin
      // aggregate + one misclassified semi-join + a 65-row collect —
      // cost must track token mass linearly across all 5 rounds.
      time(s"quality_perceptron") {
        val out = graft.operators.Classifier
          .qualityPerceptronFrom(docs).persist()
        val train = out.filter(col("is_train"))
        val acc = train.filter(col("predicted") === col("label")).count()
        val n = train.count()
        println(s"[scale]   perceptron: train_correct=$acc/$n")
        out.unpersist()
        n
      }
      // dup-graph communities (q219's shape): funnel candidates +
      // 6 edge-linear move rounds over the pairs-only graph; amplified
      // copyvariant families are near-dup cliques, so community count
      // must track the BASE corpus, not the amplified mass.
      time(s"dup_graph_communities") {
        val cm = graft.operators.Dedup.dupGraphCommunitiesFrom(docs)
          .persist()
        val nc = cm.select(col("community")).distinct().count()
        println(s"[scale]   dup communities: members=${cm.count()} " +
          s"communities=$nc")
        cm.unpersist()
        nc
      }
      // BPE rung (q209/q210's shape): the ONLY corpus-scale terms are
      // the word-count aggregate and the final encode join — every
      // merge round runs on the distinct-word vocabulary, which the
      // copyvariant tails grow only by ~mult words, so 10× corpus mass
      // must cost well under 10× wall.
      time(s"bpe_train_and_count") {
        val stats = graft.operators.Bpe.bpeTokenStatsFrom(spark, docs)
        val r = stats.agg(sum(col("n_ws_tokens")), sum(col("n_bpe_tokens")))
          .head()
        println(s"[scale]   bpe: ws_tokens=${r.getLong(0)} " +
          s"bpe_tokens=${r.getLong(1)}")
        r.getLong(1)
      }
      // BPE R-cliff (the Bpe.scala envelope claim, measured): the
      // ENCODE folds R merges into an R-deep replace expression chain
      // that Catalyst walks per analysis/codegen pass and that scans
      // every word once per rule at execution. Measured on a 50k-word
      // zipf-shaped vocabulary (the q140 generator's realism argument —
      // the fixture's ~50 words hide per-row cost): 8 REAL trained
      // rules padded to depth R with never-matching rules, which pay
      // exactly the per-rule scan + tree-walk a real rule pays.
      // Training's own R-scaling is round-trip bound and measured once
      // at R=8 (the per-round driver latency the scaladoc envelope
      // quotes).
      if (mult == 1) time(s"bpe_encode_cliff") {
        val vocabN = 50000
        val wcR = spark.range(vocabN).select(
          concat(lit("w"), col("id").cast("string"),
            lit("abcdefgh").substr(lit(1),
              (pmod(col("id"), lit(8)) + 1).cast("int"))).as("w"),
          lit(1L).as("cnt")).persist()
        wcR.count()
        val t0 = System.nanoTime()
        val base = graft.operators.Bpe.trainMergesDelta(wcR, 8)
          .map(m => (m._1, m._2))
        println(f"[scale]   bpe cliff train R=8 on $vocabN words: " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
          f"(${(System.nanoTime() - t0) / 8e9}%.1f s/round driver latency)")
        Seq(8, 64, 256).foreach { r =>
          val rules = (base ++ (base.length until r)
            .map(i => (s"#$i", "#"))).take(r)
          val t1 = System.nanoTime()
          val ntok = graft.operators.Bpe.wordTokensChain(wcR, rules)
            .agg(sum(col("n_tok"))).head().getLong(0)
          println(f"[scale]   bpe encode chain R=$r%-4d: " +
            f"${(System.nanoTime() - t1) / 1e9}%.1f s tokens=$ntok")
        }
        // the production-R form: ONE array<struct> literal folded with
        // `aggregate` — expression-tree size O(1) in R, so the chain's
        // analyzer/codegen cliff is gone; same per-row replaces. The
        // R=1024 chain row above is deliberately not run (it is the
        // cliff); fold rows bracket it and continue past it.
        Seq(8, 256, 1024).foreach { r =>
          val rules = (base ++ (base.length until r)
            .map(i => (s"#$i", "#"))).take(r)
          val t1 = System.nanoTime()
          val ntok = graft.operators.Bpe.wordTokensFold(wcR, rules)
            .agg(sum(col("n_tok"))).head().getLong(0)
          println(f"[scale]   bpe encode fold  R=$r%-4d: " +
            f"${(System.nanoTime() - t1) / 1e9}%.1f s tokens=$ntok")
        }
        wcR.unpersist()
        1L
      }
      // perceptron at fasttext-ish bucket count (q218's B envelope):
      // B = 4096 vs the registered 64 — per-round cost is one margin
      // aggregate over the SAME (doc, bucket) count relation (row count
      // tracks distinct-bucket-per-doc mass, bounded by token mass) and
      // a ≤(B+1)-row delta collect, so wall must track token mass, not
      // B; the weight relation stays broadcast metadata.
      time(s"perceptron_B4096") {
        val out = graft.operators.Classifier
          .qualityPerceptronFrom(docs, buckets = 4096).persist()
        val train = out.filter(col("is_train"))
        val acc = train.filter(col("predicted") === col("label")).count()
        val n = train.count()
        println(s"[scale]   perceptron B=4096: train_correct=$acc/$n")
        out.unpersist()
        n
      }
      val vecs = (0 until mult).map { i =>
        t.embeddings.select(
          (col("vec_id") + lit(i * 10000000L)).as("vec_id"), col("embedding"))
      }.reduce(_ union _)
      time(s"ann_lsh_topk")(
        graft.operators.Similarity.annLshTopKFrom(
          vecs, vecs.filter(col("vec_id") < 10)).count())
      // dedup ACTION tiers: every amplified copy is an exact (embedding)
      // or near (text) duplicate of its base, so drops/merges must grow
      // linearly with mult while candidate work stays cell/band-bounded.
      // K scales with the corpus (K ~ N/B, the operator's documented
      // scale path) — a fixed K would push every cell over the
      // conservative maxCell guard and the dedup would (correctly, but
      // uninformatively) keep everything.
      time(s"semantic_dedup") {
        val d = graft.operators.Similarity
          .semanticDedupFrom(vecs, 0.35, k = 16 * mult)
        val dropped = d.filter(!col("kept")).count()
        println(s"[scale]   semantic dedup: vectors=${d.count()} dropped=$dropped")
        dropped
      }
      // the hierarchical assignment at the same scaled K: per-row cost
      // drops from K dots to √K + |super| — the flat path's measured
      // O(N·K) assignment term is the one super-linearity in the tree
      time(s"semantic_dedup_two_level") {
        val d = graft.operators.Similarity
          .semanticDedupFrom(vecs, 0.35, k = 16 * mult, twoLevel = true)
        val dropped = d.filter(!col("kept")).count()
        println(s"[scale]   two-level: vectors=${d.count()} dropped=$dropped")
        dropped
      }
      // group-semantics SemDeDup (q136's shape): the same cell-bounded
      // pair evidence, then CC over dup PAIRS only — merges must track
      // the amplified dup mass like the text keep-list above.
      // fixed-point k-means (q142's shape): K scales with the corpus
      // like the SemDeDup rows; per-iteration cost must track the
      // assignment scan (N·K dots) + the metadata-scale centroid
      // aggregate, linearly in N at fixed K/N ratio.
      time(s"kmeans_fixed_point") {
        val a = graft.operators.Similarity
          .kmeansCellsFrom(vecs, k = 8 * mult, iters = 3)
        val cells = a.select(col("cell")).distinct().count()
        println(s"[scale]   kmeans: vectors=${a.count()} cells_used=$cells")
        cells
      }
      // K=160: 160×64 = 10,240 centroid components — past the inline
      // budget, so the shared dispatch routes assignment through the
      // broadcast centroid relation instead of a Catalyst literal tree
      // (bit-equal; spec'd). Cost must stay ~K/8 × the row above, not
      // blow up on plan analysis time.
      time(s"kmeans_k160_broadcast") {
        val a = graft.operators.Similarity
          .kmeansCellsFrom(vecs, k = 160, iters = 1)
        val cells = a.select(col("cell")).distinct().count()
        println(s"[scale]   kmeans k160: vectors=${a.count()} cells_used=$cells")
        cells
      }
      // PQ + ADC (q148's shape): a FIXED ~10-query batch against the
      // amplified corpus — queryMod scales with mult so the measured
      // cost is the per-query linear ADC scan (encode map pass + M
      // lookups per (query, vector)), not the fixture's query-count
      // growth. Must scale linearly in corpus size at fixed batch.
      time(s"pq_adc_topk") {
        val r = graft.operators.Similarity
          .pqAdcTopKFrom(vecs, topK = 3, queryMod = 50L * mult)
        val n = r.count()
        println(s"[scale]   pq adc: result_rows=$n")
        n
      }
      // MRL truncate-before-training (q244's shape): two trained
      // IVFADC plans (cell-bounded) + the brute truth scan, query
      // batch held ~fixed via queryMod — wall must track corpus mass
      // linearly; the read-mass ratio must hold at the sub-space
      // ratio (4x) independent of scale.
      time(s"mrl_prefix_ivfadc") {
        val r = graft.operators.Similarity
          .mrlPrefixIvfAdcFrom(vecs, queryMod = 50L * mult).collect()
        val rf = r.map(_.getLong(3)).sum.toDouble
        val rp = r.map(_.getLong(4)).sum.toDouble
        println(s"[scale]   mrl prefix: queries=${r.length} " +
          s"r3_full=${r.map(_.getLong(1)).sum} " +
          s"r3_prefix=${r.map(_.getLong(2)).sum} " +
          f"read_ratio=${rf / rp}%.2f")
        r.length.toLong
      }
      // q247's shape: the same prefix re-quantized at 2×8 dims — the
      // resolution knob for the duplicate-flood saturation the M=1
      // row shows at 10×; wall tracks the same training+truth terms.
      time(s"mrl_prefix_ivfadc2") {
        val r = graft.operators.Similarity
          .mrlPrefixIvfAdc2From(vecs, queryMod = 50L * mult).collect()
        println(s"[scale]   mrl prefix M=2: queries=${r.length} " +
          s"r3_prefix2=${r.map(_.getLong(1)).sum}")
        r.length.toLong
      }
      time(s"semantic_keep_list") {
        val kl = graft.operators.Similarity
          .semanticKeepListFrom(vecs, 0.35, k = 16 * mult)
        val merged = kl.filter(col("vec_id") =!= col("canonical_id")).count()
        println(s"[scale]   semantic keep-list: vectors=${kl.count()} merged=$merged")
        merged
      }
      time(s"fuzzy_dedup_keep") {
        val k = graft.operators.Dedup.fuzzyDedupKeepFrom(spark, docs)
        val merged = k.filter(col("doc_id") =!= col("canonical_id")).count()
        println(s"[scale]   fuzzy keep-list: docs=${k.count()} merged=$merged")
        merged
      }
      // exact τ-Jaccard join (q140's shape) on a corpus whose VOCABULARY
      // scales with its size (the realistic Zipf-tail regime the prefix
      // filter is built for — the tiny-vocab TPC-H word-salad fixture is
      // its documented worst case, where output itself is quadratic):
      // planted cliques of 10 docs sharing 25 group tokens plus 3
      // doc-unique tokens → intra-clique jac = 25/31 ≈ 0.81 ≥ τ,
      // cross-clique 0. Every doc's prefix is its rarest tokens (the
      // unique ones + few group tokens), so candidates == intra-clique
      // pairs — LINEAR in corpus size while all-pairs grows as N²/2.
      time(s"jaccard_join") {
        val nd = 5000L * mult
        val jd = spark.range(nd).select(col("id").as("doc_id"), concat(
          array_join(transform(sequence(lit(0), lit(24)),
            i => concat(lit("g"), (col("id") / 10).cast("long"),
              lit("t"), i)), " "),
          lit(" "),
          array_join(transform(sequence(lit(0), lit(2)),
            i => concat(lit("u"), col("id"), lit("x"), i)), " "))
          .as("text"))
        val j = graft.operators.Dedup.jaccardJoinFrom(jd)
        val pairs = j.count()
        println(s"[scale]   jaccard join: docs=$nd pairs=$pairs " +
          s"(expect ${45 * nd / 10})")
        pairs
      }
      // arbitrary-span repeated-substring detection (q192's shape):
      // constructed corpus where every 10th doc plants one shared
      // 20-token span into otherwise-unique text — span mass grows
      // linearly with docs, and the funnel (gram count shuffle +
      // left-semi + per-doc run-merge) must track token mass linearly:
      // no pair enumeration exists anywhere to go quadratic.
      time(s"repeated_spans") {
        val nd = 5000L * mult
        val span = (1 to 20).map(i => s"sp$i").mkString(" ")
        val rd = spark.range(nd).select(col("id").as("doc_id"),
          concat(
            array_join(transform(sequence(lit(0), lit(14)),
              i => concat(lit("u"), col("id"), lit("w"), i)), " "),
            when(col("id") % 10 === 0, lit(" " + span)).otherwise(lit("")),
            lit(" "),
            array_join(transform(sequence(lit(0), lit(9)),
              i => concat(lit("v"), col("id"), lit("y"), i)), " "))
            .as("text"))
        val spans = graft.operators.Dedup.repeatedSpansFrom(rd).count()
        println(s"[scale]   repeated spans: docs=$nd spans=$spans " +
          s"(expect ${nd / 10})")
        // the cleaning tier on the same corpus: every planted copy but
        // the canonical first drops its 20 tokens — dropped mass grows
        // linearly, reassembly stays per-doc bounded
        val dropped = graft.operators.Dedup.spanDedupCleanFrom(rd)
          .agg(sum(col("n_dropped"))).head().getLong(0)
        println(s"[scale]   span clean: dropped_tokens=$dropped " +
          s"(expect ${20 * (nd / 10 - 1)})")
        // span decontamination (q194's shape): doc 0 is the "benchmark"
        // carrying the planted span — every planted corpus copy loses
        // exactly its 20 quoted tokens, linear in hits
        val deconDropped = graft.operators.TextAnalysis
          .spanDecontaminateFrom(rd.filter(col("doc_id") =!= 0),
            rd.filter(col("doc_id") === 0))
          .agg(sum(col("n_dropped"))).head().getLong(0)
        println(s"[scale]   span decontaminate: dropped_tokens=" +
          s"$deconDropped (expect ${20 * (nd / 10 - 1)})")
        spans
      }
      // leakage-safe split (q195's shape): every amplified copy is a
      // near-dup of its base, so each base doc's component (size=mult)
      // must land on ONE split side; cost must track the keep-list
      // funnel linearly (the split itself is one hash+CASE projection).
      time(s"leakage_safe_split") {
        val s = graft.operators.Dedup.leakageSafeSplitFrom(spark, docs)
        val straddled = s.groupBy(col("canonical_id"))
          .agg(countDistinct(col("split")).as("ns"))
          .filter(col("ns") > 1).count()
        val merged = s.filter(col("doc_id") =!= col("canonical_id")).count()
        println(s"[scale]   leakage split: docs=${s.count()} merged=$merged " +
          s"straddled_components=$straddled (expect 0)")
        straddled
      }
      // DSIR importance (q196's shape): token explode into a B-bounded
      // broadcast model — time must track token mass linearly; the model
      // assembly (B rows) and the top-k (bounded heaps) are flat.
      time(s"dsir_importance") {
        graft.operators.CorpusOps.dsirImportanceFrom(docs).count()
      }
      // streaming contamination monitor (q197's shape): a FIXED
      // benchmark gram set (eval suites don't grow with the corpus)
      // probed by 8 micro-batches of the amplified corpus — per-batch
      // cost is O(batch grams) + O(batch + touched keys) merge, so
      // per-batch times must stay FLAT across batches as the store
      // accumulates (a trend = O(store)-per-batch work crept back).
      time(s"streaming_contamination") {
        val bench = graft.operators.TextAnalysis
          .docGrams(t.documents.filter(col("doc_id") % 5 === 0)
            .select(col("doc_id"), col("text")))
          .select(col("g")).distinct().persist()
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_contam").toString
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        (0 until 8).foreach { i =>
          val b0 = System.nanoTime()
          graft.streaming.StreamingMv.contamBatch(
            corpus.filter(pmod(col("doc_id"), lit(8)) === i),
            bench, storeDir, i)
          println(f"[scale]   contam batch $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
        }
        val flagged = graft.streaming.StreamingMv
          .contamTable(spark, storeDir).count()
        bench.unpersist()
        println(s"[scale]   streaming contamination: flagged=$flagged")
        flagged
      }
      // streaming span monitor (q202's shape): per-batch work is a PURE
      // O(batch) append (window index + the batch's own digest counts —
      // nothing merged, "duplicated" is monotone), so per-batch times
      // must stay flat across batches at any store size; the readout
      // pays the one-shot aggregate once.
      time(s"streaming_spans") {
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_spans").toString
        (0 until 8).foreach { i =>
          val b0 = System.nanoTime()
          graft.streaming.StreamingDedup.spanBatch(
            docs.filter(pmod(col("doc_id"), lit(8)) === i), storeDir, i)
          println(f"[scale]   span batch $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
        }
        val n = graft.streaming.StreamingDedup
          .spanTable(spark, storeDir).count()
        println(s"[scale]   streaming spans: rows=$n")
        n
      }
      // streaming sibling (q133's shape): the SAME corpus fed as 4
      // micro-batches against an accumulating signature store — per-batch
      // cost must stay band-bounded (new×store equi-join on band keys,
      // never all-pairs), so total time tracks the one-shot batch funnel
      // plus store-append I/O, and the assembled keep-list must merge the
      // same near-dup mass as the batch tier above.
      // Per-batch wall time is printed for each of the 8 micro-batches:
      // the guard merges a cumulative counts snapshot instead of
      // re-aggregating the store, so times must stay FLAT as the store
      // accumulates (a growing trend = O(store)-per-batch work crept back).
      time(s"streaming_keep_list") {
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_stream").toString
        (0 until 8).foreach { i =>
          val b0 = System.nanoTime()
          graft.streaming.StreamingDedup.dedupBatch(
            docs.filter(pmod(col("doc_id"), lit(8)) === i), storeDir, i)
          println(f"[scale]   streaming batch $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
        }
        // store-pruning evidence: the band store is hash-bucketed on its
        // join key (pb= dirs); a single doc's band keys touch ≤16 of the
        // 64 buckets, so the per-batch store read for a 1-doc trailing
        // batch opens only those buckets' FILES — read mass must track
        // the touched-bucket count, not the accumulated store size.
        val bands = spark.read.parquet(s"$storeDir/bands")
        val totalRows = bands.count()
        val touched = bands.filter(col("doc_id") === 1)
          .select(col("pb")).distinct().collect().map(_.getInt(0)).toSeq
        val pruned = bands.filter(col("pb").isin(touched: _*))
        val qe = pruned.queryExecution
        val prunedRows = qe.toRdd.count()
        val files = qe.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numFiles").value
        }.sum
        val totFiles = {
          val q2 = bands.queryExecution
          q2.toRdd.count()
          q2.executedPlan.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec =>
              s.metrics("numFiles").value
          }.sum
        }
        println(s"[scale]   band store pruning: buckets=${touched.length}/" +
          s"${graft.streaming.StreamingDedup.StoreBuckets} " +
          s"rows=$prunedRows/$totalRows files=$files/$totFiles")
        val k = graft.streaming.StreamingDedup.keepList(spark, storeDir)
        val merged = k.filter(col("doc_id") =!= col("canonical_id")).count()
        println(s"[scale]   streaming keep-list: docs=${k.count()} merged=$merged")
        merged
      }
      // streaming SemDeDup (q135's shape): the same vectors fed as 4
      // micro-batches against an accumulating assignment store, frozen
      // quantizer at the SAME scaled K as the batch tiers above —
      // per-batch pairwise work must stay cell-bounded (new×store join on
      // the cell id) and drops must track the batch decision table.
      time(s"streaming_semantic_dedup") {
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_stream_sem").toString
        val cents = graft.operators.Similarity.centroidDirs(vecs, 16 * mult)
        (0 until 8).foreach { i =>
          val b0 = System.nanoTime()
          graft.streaming.StreamingDedup.semanticBatch(
            vecs.filter(pmod(col("vec_id"), lit(8)) === i),
            storeDir, cents, 0.35, i)
          println(f"[scale]   streaming sem batch $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
        }
        val d = graft.streaming.StreamingDedup
          .semanticDecisionTable(spark, storeDir)
        val dropped = d.filter(!col("kept")).count()
        println(s"[scale]   streaming semantic: vectors=${d.count()} dropped=$dropped")
        dropped
      }
      // streaming tokenizer-drift monitor (q216's shape): batch 0 pays
      // BPE training once (vocabulary-scale delta rounds); batches 1-7
      // are encode-only — one token explode + a broadcast vocab join +
      // a 1-row stats write — so their per-batch times must stay FLAT
      // (and well under batch 0's) regardless of how many stats rows
      // the store has accumulated.
      time(s"streaming_token_drift") {
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_drift").toString
        (0 until 8).foreach { i =>
          val b0 = System.nanoTime()
          graft.streaming.StreamingMv.driftBatch(
            docs.filter(pmod(col("doc_id"), lit(8)) === i), storeDir, i)
          println(f"[scale]   drift batch $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
        }
        val d = graft.streaming.StreamingMv.driftTable(spark, storeDir)
          .agg(sum(col("n_ws_tokens")), sum(col("n_bpe_tokens"))).head()
        println(s"[scale]   drift monitor: ws=${d.getLong(0)} " +
          s"bpe=${d.getLong(1)}")
        d.getLong(1)
      }
      // streaming novelty monitor (q221's shape): per-batch ingest is a
      // PURE O(batch) append (the doc's distinct grams, shingled once,
      // plus the batch's own gram-count delta) — per-batch times must
      // stay flat as the gram store grows. The READOUT is non-monotone
      // (a later copy un-novels an earlier doc), so it re-sums the
      // per-batch df deltas — timed at half and full store to show it
      // tracks INGESTED mass (the one-shot q213 cost), not batches².
      time(s"streaming_novelty") {
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_novelty").toString
        (0 until 8).foreach { i =>
          val b0 = System.nanoTime()
          graft.streaming.StreamingMv.noveltyBatch(
            docs.filter(pmod(col("doc_id"), lit(8)) === i), storeDir, i)
          println(f"[scale]   novelty batch $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
          if (i == 3 || i == 7) {
            val r0 = System.nanoTime()
            val nd = graft.streaming.StreamingMv
              .noveltyTable(spark, storeDir).count()
            println(f"[scale]   novelty readout after ${i + 1} batches: " +
              f"${(System.nanoTime() - r0) / 1e9}%.2f s ($nd docs)")
          }
        }
        1L
      }
      // incremental MV (q162's shape): 8 micro-batches folded into the
      // snapshot store — per-batch cost is O(batch + MV rows) and the MV
      // (windows × types) does NOT grow with the amplified event count,
      // so per-batch times must stay flat and the final view must equal
      // the one-shot aggregate's row count.
      time(s"streaming_mv") {
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_mv").toString
        val evm = ev.select(col("event_id"), col("ts"), col("event_type"),
          col("value"))
        (0 until 8).foreach { i =>
          val b0 = System.nanoTime()
          graft.streaming.StreamingMv.mvBatch(
            evm.filter(pmod(col("event_id"), lit(8)) === i), storeDir, i)
          println(f"[scale]   mv batch $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
        }
        graft.streaming.StreamingMv.mvTable(spark, storeDir).count()
      }
      // streaming funnel store (q154's shape, post the round-14 sink
      // fix): 8 batches of per-user state updates compacted through
      // Snapshots.mergeLatest — per-batch cost is O(batch + store keys)
      // with the store at DISTINCT-USER scale (the operator's own state
      // size), never the O(users × batches) update log the old memory
      // sink accumulated on the driver; per-batch times must stay flat
      // as batches land and the final table must hold one row per user.
      time(s"streaming_funnel_store") {
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_funnel").toString
        (0 until 8).foreach { i =>
          val b0 = System.nanoTime()
          val upd = ev.filter(pmod(col("event_id"), lit(8)) === i)
            .groupBy(col("user_id"))
            .agg(max(unix_micros(col("ts"))).as("view_us"))
            .select(col("user_id"), col("view_us"),
              lit(-1L).as("click_us"), lit(-1L).as("purchase_us"),
              lit(i.toLong).as("upd"))
          graft.streaming.EventStreams.funnelBatch(upd, storeDir, i)
          println(f"[scale]   funnel batch $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
        }
        val users = graft.streaming.EventStreams
          .funnelTable(spark, storeDir).count()
        println(s"[scale]   funnel store: users=$users")
        users
      }
      // streaming transition matrix (q186's shape, post the round-14
      // sink fix): per-batch (prev, next) deltas folded ADDITIVELY into
      // the ≤ types² counts snapshot — the merge reads matrix rows +
      // batch, never event history, so per-batch times must stay flat
      // and the matrix row count must stay at types² no matter the
      // amplification.
      time(s"streaming_transitions_store") {
        val storeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_trans").toString
        val wl = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        (0 until 8).foreach { i =>
          val b0 = System.nanoTime()
          val delta = ev.filter(pmod(col("event_id"), lit(8)) === i)
            .withColumn("next_type", lead(col("event_type"), 1).over(wl))
            .filter(col("next_type").isNotNull)
            .select(col("event_type").as("prev_type"), col("next_type"))
          graft.streaming.EventStreams.transBatch(delta, storeDir, i)
          println(f"[scale]   trans batch $i: ${(System.nanoTime() - b0) / 1e9}%.2f s")
        }
        val cells = graft.streaming.EventStreams
          .transitionsTable(spark, storeDir).count()
        println(s"[scale]   transition matrix: cells=$cells")
        cells
      }
      // the pathological corpus at scale: mult×10k BYTE-IDENTICAL docs —
      // every band bucket is one corpus-sized hot bucket, the LSH worst
      // case no banding fixes. The guard bounds pair generation to zero
      // and the escalation rung must still collapse the whole mass via
      // the linear exact-dedup path: n_escalated = N-1 and time ~linear
      // in mult (any superlinearity here means the rung went pairwise).
      time(s"degenerate_escalation") {
        val one = t.documents.filter(col("doc_id") === 0L)
          .select(substring(col("text"), 1, 100).as("text")).head().getString(0)
        val degen = spark.range(mult * 10000L)
          .select(col("id").as("doc_id"), lit(one).as("text"))
        val r = graft.operators.Dedup.minhashLshSummaryFrom(degen).head()
        println(s"[scale]   degenerate: docs=${r.getLong(0)} " +
          s"cand=${r.getLong(1)} skipped_rows=${r.getLong(4)} " +
          s"escalated=${r.getLong(5)}")
        r.getLong(5)
      }
      // graph shapes: edges derived from the amplified orders copy (each
      // copy is a shifted sub-graph — node count grows with mult)
      val de = ord.select(
        col("o_custkey").as("src"),
        (lit(1L) + (col("o_orderkey") % lit(15000L))
          + (col("o_custkey") - col("o_custkey") % lit(10000000L))).as("dst"))
        .distinct()
      val ue = de.union(de.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      time(s"csr_adjacency_build")(
        graft.operators.GraphOps.adjacencyBuildFrom(
          spark, ue, mult * 10000000L + 15001L).count())
      time(s"pagerank_10iter")(
        graft.operators.GraphOps.pageRankFrom(spark, de).count())
      time(s"p2p_routing_batch") {
        // batched od routing over the amplified graph: one sweep, 5 origins
        val w = ue.select(col("src"), col("dst"),
          graft.operators.GraphOps.edgeWeight(col("src"), col("dst")).as("w"))
        graft.operators.GraphOps
          .multiSourceCostsFrom(spark, w, Seq(1L, 2L, 3L, 4L, 5L), 8).count()
      }
      // flagship regtest shape (bfsgraph_regtest: k randomized-source BFS
      // over one loaded graph): k sources in ONE weight-1 sweep vs the
      // unbatched alternative. The separate row runs 8 of the 32 sources —
      // its full-k cost is ×4 that — so batched must land well under
      // separate×4 for the batching claim to hold at this scale.
      val uw = ue.select(col("src"), col("dst"), lit(1L).as("w"))
      val bfsSrcs = (0 until 32).map(i => 1L + (i.toLong * 37L) % 15000L)
      time(s"multi_source_bfs_batched_k32")(
        graft.operators.GraphOps
          .multiSourceCostsFrom(spark, uw, bfsSrcs, 10).count())
      time(s"multi_source_bfs_separate_8_of_32")(
        bfsSrcs.take(8).map { s =>
          graft.operators.GraphOps
            .multiSourceCostsFrom(spark, uw, Seq(s), 10).count()
        }.sum)
      time(s"multi_source_paths_batch") {
        // the q127 shape: route reconstruction rides the same sweep —
        // state adds two bounded strings per (origin, node) row
        val w = ue.select(col("src"), col("dst"),
          graft.operators.GraphOps.edgeWeight(col("src"), col("dst")).as("w"))
        graft.operators.GraphOps
          .multiSourcePathsFrom(spark, w, Seq(1L, 2L, 3L, 4L, 5L), 8).count()
      }
      // sampled betweenness (q205's shape): the source sample scales
      // with the graph (8 per amplified copy — the honest posture for
      // SAMPLED centrality), so total work is per-source-bounded ×
      // linear in the sample; per-source cost is the 4-hop two-pass.
      time(s"betweenness_sample") {
        val srcs = (0 until mult).flatMap(c =>
          (0 until 8).map(i => c * 10000000L + 1L + (i * 41L) % 15000L))
        graft.operators.GraphOps.betweennessFrom(spark, ue, srcs, 4).count()
      }
      time(s"triangle_count")(
        graft.operators.GraphOps.triangleCountFrom(ue).head().getLong(0))
      // two-hop hub cap (q165's guard): a degenerate planted hub of
      // degree 20k·mult grafted onto the amplified graph. Uncapped, the
      // hub alone contributes ~4·10⁸·mult² wedges to one join key; with
      // the registered 256 cap the hub is refused and wedge mass stays
      // bounded by the mild-degree remainder — this row's cost must
      // track the OTHER graph rows linearly, and the skipped-mass
      // summary must carry exactly the hub's deg·(deg−1).
      time(s"two_hop_capped_hub") {
        val hubId = mult * 10000000L + 999999L
        val hubDeg = 20000L * mult
        val hub = spark.range(1, hubDeg + 1)
          .select(lit(hubId).as("src"), col("id").as("dst"))
        val ueHub = ue.union(hub)
          .union(hub.select(col("dst").as("src"), col("src").as("dst")))
        val th = graft.operators.GraphOps
          .twoHopCountsFrom(ueHub, midDegCap = 256)
        val first = th.head()
        println(s"[scale]   two-hop: capped_mids=${first.getLong(2)} " +
          s"capped_wedges=${first.getLong(3)} (hub deg=$hubDeg)")
        th.count()
      }
      // k-truss peel on the planted-hub graph (q175's shape): the
      // per-round triangle enumeration is now (deg,id)-DEGREE-oriented
      // over surviving edges, so the 20k·mult-degree hub — whose
      // id-oriented wedge join would put ~(deg/2)² pairs on one key
      // EVERY round — has near-zero out-degree and its wedges are
      // charged to its degree-1 spokes. This row's cost must track the
      // triangle_count row, not the hub's deg².
      time(s"ktruss_planted_hub") {
        val hubId = mult * 10000000L + 888888L
        val hubDeg = 20000L * mult
        val hub = spark.range(1, hubDeg + 1)
          .select(lit(hubId).as("src"), col("id").as("dst"))
        val ueHub = ue.union(hub)
          .union(hub.select(col("dst").as("src"), col("src").as("dst")))
        val (tr, rounds) = graft.operators.GraphOps.kTrussWithRounds(ueHub, 3)
        val survivors = tr.count()
        println(s"[scale]   ktruss hub: survivors=$survivors " +
          s"rounds=$rounds (hub deg=$hubDeg)")
        survivors
      }
      // q140 on a REALISTIC vocabulary (the round-14 verdict's ask): the
      // registered fixture's ~50-word vocabulary defeats df-ordered
      // prefixes (every term hits most docs), so this row generates a
      // skewed (inverse-square rank, zipf-like) vocabulary — rank =
      // V div (1 + u) over a uniform integer hash — and reports the
      // candidate mass each PPJoin rung leaves: every-token-collision
      // vs prefix+length vs prefix+length+positional vs verified.
      if (mult == 1) time(s"jaccard_zipf_candidates") {
        val nDocs = 2000; val vocab = 50000
        val zdocs = spark.range(nDocs).select(col("id").as("doc_id"),
          expr(s"""array_join(transform(sequence(1, 60), j ->
            concat('z', CAST($vocab div (1 + pmod(hash(id * 100 + j),
            $vocab)) AS STRING))), ' ')""").as("text"))
        val (unf, pl, full, ver) =
          graft.operators.Dedup.jaccardCandidateDiag(zdocs)
        println(s"[scale]   zipf candidates: token_collisions=$unf " +
          s"prefix_length=$pl +positional=$full verified=$ver")
        full
      }
      // modularity communities (q211's shape) on the SAME planted-hub
      // graph: per round the hub contributes deg candidate rows (its
      // distinct neighbor labels), never deg² — candidate mass is
      // bounded by the edge list, so no hub cap exists or is needed.
      // Cost must track edge mass round-over-round.
      time(s"modularity_planted_hub") {
        val hubId = mult * 10000000L + 888888L
        val hubDeg = 20000L * mult
        val hub = spark.range(1, hubDeg + 1)
          .select(lit(hubId).as("src"), col("id").as("dst"))
        val ueHub = ue.union(hub)
          .union(hub.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        // BOTH levels (q215): level 2 runs on the community-sized
        // contracted graph, so its cost must be a rounding error next
        // to level 1's edge-linear rounds even with the hub present.
        val cm = graft.operators.GraphOps.louvainTwoLevelFrom(ueHub)
          .persist()
        val n1 = cm.select(col("community_l1")).distinct().count()
        val n2 = cm.select(col("community")).distinct().count()
        println(s"[scale]   modularity 2-level: nodes=${cm.count()} " +
          s"l1_communities=$n1 l2_communities=$n2 (hub deg=$hubDeg)")
        cm.unpersist()
        n2
      }
      // IVFADC operating-point sweep (q159/q179's shape): recall@3 vs
      // the exact integer L2 top-3 at nprobe ∈ {1,2,4,8} on trained
      // codes, plus the untrained seed-codebook composition at the
      // registered nprobe=4 — the sensitivity table a deployment reads
      // before picking its operating point (recorded in SCALING.md).
      if (mult == 1) time(s"ivfadc_nprobe_sweep") {
        val fx = t.embeddings.select(col("vec_id"), col("embedding"))
        def meanRecall(np: Int, iters: Int, coarse: Int): Double = {
          val r = graft.operators.Similarity
            .ivfAdcRecallEvalFrom(fx, nprobe = np, trainIters = iters,
              coarseIters = coarse)
          val m = r.agg(avg(col("recall3"))).head().getDouble(0)
          val t0 = System.nanoTime()
          r.count()
          println(f"[scale]   ivfadc nprobe=$np pq_iters=$iters " +
            f"coarse_iters=$coarse " +
            f"mean_recall3=$m%.2f (${(System.nanoTime() - t0) / 1e9}%.1f s)")
          m
        }
        val pqI = graft.operators.Similarity.PqTrainIters
        val kcI = graft.operators.Similarity.IvfCoarseIters
        Seq(1, 2, 4, 8).foreach(np => meanRecall(np, pqI, kcI))
        meanRecall(4, pqI, 0) // untrained coarse cells, trained codes
        meanRecall(4, 0, 0)   // the fully untrained baseline
        // cell-population balance, seeded vs trained coarse cells: the
        // max/mean ratio is the 100 TB skew readout — a hot cell is a
        // straggler task for every query that probes it.
        Seq(0, kcI).foreach { ci =>
          val pops = graft.operators.Similarity
            .coarseCellPopulations(fx, k = 16, coarseIters = ci)
            .collect().map(_.getLong(1))
          println(f"[scale]   ivf cells coarse_iters=$ci " +
            f"max=${pops.max} mean=${pops.sum / pops.length} " +
            f"ratio=${pops.max.toDouble * pops.length / pops.sum}%.2f " +
            f"nonempty=${pops.count(_ > 0)}/16")
        }
        1L
      }
      // residual-IVFADC on a CLUSTERED corpus at bench scale (the
      // production claim, measured where it applies): members = one of
      // 16 well-separated fixture centers + a 5% per-vector offset, at
      // the full sf0.1 vector count. True neighbors share the query's
      // cell, so the trained coarse quantizer should recover the
      // planted structure and residual codes should separate within-
      // cell detail — recall must saturate at LOW nprobe (the isotropic
      // fixture's flat sweep is the no-structure control). Re-rank at
      // the saturating nprobe is the served operating point.
      if (mult == 1) time(s"ivfadc_clustered_sweep") {
        val cents16 = t.embeddings.filter(col("vec_id") < 16)
          .select(pmod(col("vec_id"), lit(16L)).as("cid"),
            col("embedding").as("ce"))
        val clustered = t.embeddings
          .select(col("vec_id"), pmod(col("vec_id"), lit(16L)).as("cid"),
            col("embedding"))
          .join(broadcast(cents16), Seq("cid"))
          .select(col("vec_id"),
            zip_with(col("ce"), col("embedding"),
              (c, e) => c + e * lit(0.05f)).as("embedding"))
          .persist()
        clustered.count()
        Seq(1, 2, 4, 8).foreach { np =>
          val t0 = System.nanoTime()
          val m = graft.operators.Similarity
            .ivfAdcRecallEvalFrom(clustered, nprobe = np)
            .agg(avg(col("recall3"))).head().getDouble(0) / 3.0
          println(f"[scale]   clustered nprobe=$np mean_recall3=$m%.2f " +
            f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
        }
        // re-rank recall at nprobe=1 (the saturating point): exact-L2
        // re-score of the ADC shortlist vs the exact top-3 truth
        val t0 = System.nanoTime()
        val appx = graft.operators.Similarity
          .ivfAdcRerankTopKFrom(clustered, nprobe = 1)
          .select(col("query_id"), col("neighbor_id"))
        val eqc = clustered.select(col("vec_id"),
          expr("transform(embedding, x -> CAST(floor(x * 1e6) AS BIGINT))")
            .as("e"))
        val qs = eqc.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("query_id"), col("e").as("qe"))
        val wq = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("d"), col("neighbor_id"))
        val exact = eqc.select(col("vec_id").as("neighbor_id"), col("e"))
          .join(broadcast(qs), col("neighbor_id") =!= col("query_id"))
          .withColumn("d", aggregate(
            zip_with(col("e"), col("qe"), (x, y) => (x - y) * (x - y)),
            lit(0L), (a, b) => a + b))
          .withColumn("rk", row_number().over(wq))
          .filter(col("rk") <= 3)
          .select(col("query_id"), col("neighbor_id"))
        val hits = appx.join(exact, Seq("query_id", "neighbor_id"),
          "left_semi").count()
        val nq = qs.count()
        println(f"[scale]   clustered rerank nprobe=1 " +
          f"mean_recall3=${hits.toDouble / (3.0 * nq)}%.2f " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
        clustered.unpersist()
        1L
      }
      // RAG chunk retrieval (q223's shape): the trained IVFADC built
      // over CHUNK vectors at mult× corpus size, query batch held
      // ~fixed via queryMod — per-query candidate mass tracks probed-
      // cell CHUNK counts (N·nprobe/K), so wall must track corpus mass
      // linearly once training (vocabulary-free, sample-bounded)
      // amortizes.
      time(s"rag_chunk_index") {
        val cv = graft.operators.Similarity
          .chunkVectors(docs, t.embeddings)
        val r = graft.operators.Similarity
          .ivfAdcTopKFrom(cv, queryMod = 50L * mult)
        val n = r.count()
        println(s"[scale]   rag chunks=${cv.count()} served_rows=$n")
        n
      }
      // BM25 (q229's shape): posting-list scoring join at mult× chunk
      // mass, query batch held ~fixed — pair rows = Σ_q Σ_t df(t), and
      // df grows linearly with the corpus, so wall must track posting
      // mass linearly (the term-keyed shuffle is the only data-sized
      // term; df/idf relations stay vocabulary-scale).
      time(s"bm25_topk") {
        val n = graft.operators.TextAnalysis
          .bm25TopKFrom(docs, queryMod = 50L * mult).count()
        println(s"[scale]   bm25 served_rows=$n")
        n
      }
      // q246's shape: what the one-time compaction rewrite buys the
      // serve path — (a) serve from the RAW accumulated store (per-read
      // dedup window + the inline two-phase prune) vs (b) one
      // compaction then serve from the annotated store (stored-rank
      // filter). Same ranking by construction; the delta is the
      // window mass that left the read path.
      time(s"lex_compact_serve") {
        import graft.streaming.StreamingIndex
        val storeDir = java.nio.file.Files
          .createTempDirectory(s"graft_smoke_lexc_$mult").toString
        (0 until 3).foreach { i =>
          StreamingIndex.lexIndexBatch(
            docs.filter(pmod(col("doc_id") * 7919, lit(3)) === i),
            storeDir, i)
        }
        val t0 = System.nanoTime()
        val rawServed = graft.operators.TextAnalysis.bm25TopKFromPostings(
          StreamingIndex.lexIndexTable(spark, storeDir),
          queryMod = 50L * mult).count()
        val tRaw = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        StreamingIndex.compactLexIndex(spark, storeDir)
        val tCompact = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val fastServed = graft.operators.TextAnalysis.bm25TopKFromPostings(
          StreamingIndex.compactLexTable(spark, storeDir),
          queryMod = 50L * mult).count()
        val tFast = (System.nanoTime() - t2) / 1e9
        println(f"[scale]   lex compact: raw_serve=$tRaw%.2f s " +
          f"compact_once=$tCompact%.2f s fast_serve=$tFast%.2f s " +
          s"(rows $rawServed/$fastServed)")
        fastServed
      }
      // Z-ORDER LAYOUT PRUNING (q249's shape, physically measured):
      // write the orders dims twice under the same granule budget —
      // lexicographically range-sorted by (ck, dy) vs range-sorted by
      // the Morton code — then count, from the parquet FOOTERS, the
      // granules a stats-pruning reader must touch for a 2-D box
      // predicate (each granule is one row group by construction, so
      // file min/max == row-group stats == what any engine's skipping
      // uses). Rows are amplified WITHOUT key shifts: layout pruning is
      // about value locality, and the shifted-island amplification
      // would fabricate empty value space. Two boxes measured: aligned
      // to the 8x8 Morton cell grid (the average selective query) and
      // straddling four cells (the worst placement). Both layouts must
      // return identical query answers; the delta is granules read.
      time(s"zorder_pruning") {
        import graft.operators.Layout
        import scala.jdk.CollectionConverters._
        val dims0 = t.orders.select(col("o_custkey").as("ck"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
            .cast("long").as("dy"), col("o_totalprice"))
        val dims = (0 until mult).map(_ => dims0).reduce(_ union _)
        val b = dims.agg(min("ck"), max("ck"), min("dy"), max("dy")).head()
        val (minck, maxck, mindy, maxdy) =
          (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
        val mask = (1L << Layout.ZBits) - 1
        val q = dims
          .withColumn("xq", expr(
            s"((ck - $minck) * $mask) div ${math.max(maxck - minck, 1)}"))
          .withColumn("yq", expr(
            s"((dy - $mindy) * $mask) div ${math.max(maxdy - mindy, 1)}"))
          .withColumn("zv", Layout.zInterleave(col("xq"), col("yq")))
        val granules = 512
        val base = java.nio.file.Files
          .createTempDirectory(s"graft_smoke_zorder_$mult").toString
        q.repartitionByRange(granules, col("ck"), col("dy"))
          .sortWithinPartitions("ck", "dy")
          .write.mode("overwrite").parquet(s"$base/linear")
        q.repartitionByRange(granules, col("zv"))
          .sortWithinPartitions("zv")
          .write.mode("overwrite").parquet(s"$base/zorder")
        def stats(dir: String, ckLo: Long, ckHi: Long, dyLo: Long,
            dyHi: Long): (Int, Int, Long) = {
          val conf = spark.sparkContext.hadoopConfiguration
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(conf)
          var total = 0; var overlap = 0; var rowsTouched = 0L
          fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
            .foreach { f =>
              val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
                org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromPath(f.getPath, conf))
              val blocks =
                try rdr.getFooter.getBlocks.asScala.toList
                finally rdr.close()
              blocks.foreach { blk =>
                total += 1
                def mm(name: String): (Long, Long) = {
                  val st = blk.getColumns.asScala
                    .find(_.getPath.toDotString == name).get.getStatistics
                    .asInstanceOf[org.apache.parquet.column.statistics
                      .LongStatistics]
                  (st.getMin, st.getMax)
                }
                val (cMin, cMax) = mm("ck"); val (dMin, dMax) = mm("dy")
                if (cMin <= ckHi && cMax >= ckLo &&
                    dMin <= dyHi && dMax >= dyLo) {
                  overlap += 1; rowsTouched += blk.getRowCount
                }
              }
            }
          (total, overlap, rowsTouched)
        }
        def box(label: String, ckLo: Long, ckHi: Long, dyLo: Long,
            dyHi: Long): Long = {
          val (lt, lo, lr) = stats(s"$base/linear", ckLo, ckHi, dyLo, dyHi)
          val (zt, zo, zr) = stats(s"$base/zorder", ckLo, ckHi, dyLo, dyHi)
          def run(d: String) = spark.read.parquet(d)
            .filter(col("ck") >= ckLo && col("ck") <= ckHi &&
              col("dy") >= dyLo && col("dy") <= dyHi).count()
          val (nl, nz) = (run(s"$base/linear"), run(s"$base/zorder"))
          require(nl == nz, s"layout changed query results: $nl vs $nz")
          println(f"[scale]   zorder pruning [$label]: " +
            f"linear $lo/$lt granules rows=$lr vs " +
            f"zorder $zo/$zt granules rows=$zr " +
            f"(read-mass ${lr.toDouble / math.max(zr, 1)}%.1fx, " +
            f"result rows $nl)")
          nl
        }
        val (rck, rdy) = (maxck - minck, maxdy - mindy)
        // aligned: exactly cell (col 2, row 5) of the 8x8 Morton grid
        val a = box("aligned", minck + 2 * rck / 8, minck + 3 * rck / 8 - 1,
          mindy + 5 * rdy / 8, mindy + 6 * rdy / 8 - 1)
        // straddling: same size shifted half a cell in both dims
        box("straddle", minck + rck / 16, minck + 3 * rck / 16,
          mindy + 9 * rdy / 16, mindy + 11 * rdy / 16)
        a
      }
      // END-TO-END platform composition (the number a platform team
      // quotes): corpus in → cleaned/deduped/decontaminated/LM-gated
      // corpus out → BOTH serving indexes built from the kept corpus
      // (q246's compacted lexical store + q231's dense IVFADC store)
      // → one serve from each. Stage-by-stage wall + shuffle-write +
      // spill split, so the dominant term at each scale is named by
      // the probe itself, not inferred.
      time(s"e2e_platform") {
        import graft.operators.{TextAnalysis, Similarity}
        import graft.functions.TextFunctions
        import graft.streaming.StreamingIndex
        val shW = new java.util.concurrent.atomic.AtomicLong(0)
        val spB = new java.util.concurrent.atomic.AtomicLong(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (te.taskMetrics != null) {
              shW.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
              spB.addAndGet(te.taskMetrics.memoryBytesSpilled +
                te.taskMetrics.diskBytesSpilled)
            }
        }
        spark.sparkContext.addSparkListener(listener)
        def stage(label: String)(f: => Long): Long = {
          org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
          val (s0, p0) = (shW.get, spB.get)
          val t0 = System.nanoTime()
          val rows = f
          org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
          println(f"[scale]   e2e $label%-13s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
            f"  rows=$rows%-9d shuffle_mb=${(shW.get - s0) / 1000000L}%-7d" +
            f" spill_mb=${(spB.get - p0) / 1000000L}%d")
          rows
        }
        // stage 1: the q242 cleaning chain, ending at the KEPT corpus
        // relation instead of the mixture rollup (same stages, same
        // gates) — persisted because both index builds read it
        val keep = docs.groupBy(md5(col("text")))
          .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
        val bench = TextAnalysis.docGrams(docs.filter(col("doc_id") % 5 === 0))
          .select(col("g")).distinct()
        val corpus = docs.join(keep, Seq("doc_id"))
          .filter(col("doc_id") % 5 =!= 0)
        // Scan-attached gram probe (same fix as cleaningPipeline): at
        // 100× the keep join stops broadcasting, and an explode chained
        // behind the resulting shuffle join runs on AQE-coalesced
        // partitions sized by PRE-explode bytes — measured here as the
        // 500k-doc shingle pass on 2 tasks. Contamination is a
        // per-doc_id fact; probing dedup losers too is harmless.
        val contaminated = TextAnalysis.docGrams(
            docs.filter(col("doc_id") % 5 =!= 0))
          .join(broadcast(bench), Seq("g")).select(col("doc_id")).distinct()
        val lmKeep = TextAnalysis.lmQualityBucketsFrom(docs)
          .filter(col("bucket") < TextAnalysis.LmQualityTiles)
          .select(col("doc_id"))
        val keptPlan = corpus.join(contaminated, Seq("doc_id"), "left_anti")
          .join(lmKeep, Seq("doc_id"), "left_semi")
          .filter(TextFunctions.qualityScore(col("text")) >= 300 &&
            TextFunctions.tokenCount(col("text")).cast("long") >= 50 &&
            TextAnalysis.topwordPm(col("text")) <= 200 &&
            TextAnalysis.dupBigramPm(col("text")) <= 100)
          .select(col("doc_id"), col("text"))
        // The cleaned corpus is the stage's DELIVERABLE: write it out
        // and re-read, so the index builds plan against a parquet scan
        // instead of dragging the whole cleaning lineage into every
        // downstream job (measured: with the lineage attached, each of
        // the ~17 training/serve actions re-plans a 30-way-union tree
        // and the dense stages read 10-60x slower; a persist() does
        // NOT cut logical lineage, a store boundary does — and the
        // store boundary is what a production pipeline has anyway).
        val keptDir = java.nio.file.Files
          .createTempDirectory(s"graft_smoke_e2e_kept_$mult").toString
        val nKept = stage("clean") {
          keptPlan.write.mode("overwrite").parquet(keptDir)
          spark.read.parquet(keptDir).count()
        }
        val kept = spark.read.parquet(keptDir)
        // stage 2: lexical store — ingest the kept corpus, one
        // compaction rewrite, serve through the stored-rank fast path
        val lexDir = java.nio.file.Files
          .createTempDirectory(s"graft_smoke_e2e_lex_$mult").toString
        stage("lex_build") {
          StreamingIndex.lexIndexBatch(kept, lexDir, 0L)
          spark.read.parquet(s"$lexDir/postings").count()
        }
        stage("lex_compact") {
          StreamingIndex.compactLexIndex(spark, lexDir)
          1L
        }
        // Serve moduli must be ODD AND 5-coprime (the training-modulus
        // lesson, found again live on the serve side): cid is the
        // composite doc_id*2^20 + chunk_idx, so a modulus sharing
        // factors with 2^20 admits only low chunk indexes ≡ 0 mod
        // gcd(m, 2^20), and a multiple of 5 then forces doc_id ≡ 0 mod
        // 5^k — the exact ids the decontamination split removed. At
        // m = 5000 the query batch was structurally EMPTY and the
        // "serve" measured a no-op. m = 50·mult + 1 is odd, 5-coprime,
        // and keeps the batch ≈ corpus/m as intended; the require
        // makes an empty batch fail the probe instead of flattering it.
        val serveMod = 50L * mult + 1L
        stage("lex_serve") {
          val n = TextAnalysis.bm25TopKFromPostings(
            StreamingIndex.compactLexTable(spark, lexDir),
            queryMod = serveMod).count()
          require(n > 0, s"empty lexical query batch at serveMod=$serveMod")
          n
        }
        // stage 3: dense store — chunk-vector fixture over the kept
        // corpus (persisted: training, encoding AND the query batch
        // read it — at deployment the chunk vectors are a materialized
        // relation, not re-derived per consumer), train + encode once,
        // serve from the stored codes. Training is its own stage AND
        // runs q248's fixed-size-sample posture (sampleMod scales with
        // the corpus so Lloyd passes scan ~the same vector mass at
        // every amplification — the Jégou rule; full-train at 30× was
        // measured once at 158.8 s = 54% of the whole composition,
        // which is exactly the posture you'd never deploy).
        val cv = Similarity.chunkVectors(kept, t.embeddings).persist()
        // The sample modulus must be ODD: vec_id here is the composite
        // doc_id*2^20 + chunk_idx, and an even modulus shares factors
        // with 2^20 — at m=120 the only solutions were chunk 0 of
        // doc_id % 15 == 0 docs, ALL of which the decontamination %5
        // split had removed, so the training sample was exactly empty
        // (the engine now fails fast on that; this probe picks a
        // structure-safe modulus).
        var trained: (Array[Array[Long]], Array[Array[Array[Long]]]) = null
        stage("dense_train") {
          trained = Similarity.ivfAdcTrain(cv, sampleMod = 4L * mult + 1L)
          trained._1.length.toLong
        }
        val (coarse, cbk) = trained
        val stored = Similarity.ivfAdcEncode(cv, coarse, cbk).persist()
        stage("dense_build")(stored.count())
        stage("dense_serve") {
          val n = Similarity.ivfAdcServe(stored,
            cv.filter(col("vec_id") % serveMod === 0),
            coarse, cbk).count()
          require(n > 0, s"empty dense query batch at serveMod=$serveMod")
          n
        }
        stored.unpersist()
        cv.unpersist()
        spark.sparkContext.removeSparkListener(listener)
        nKept
      }
      // bigram surprisal (q228's shape): one adjacent-pair explode
      // (≈ token mass) off a persisted barrier feeding three aggregates
      // + a pair-keyed scoring join — wall must track token mass
      // linearly; the bigram/prefix model relations stay at
      // bigram-vocabulary scale.
      time(s"bigram_surprisal") {
        graft.operators.TextAnalysis.bigramSurprisalFrom(docs).count()
      }
      // reference-LM quality buckets (q235's shape): the q228 pair
      // explode + a vocabulary-scale smoothed model (trained on the
      // doc_id % 5 slice) + the GlobalOrder two-pass tercile — wall
      // must track token mass linearly, and the global bucket must
      // never concentrate the corpus in one window task.
      time(s"lm_buckets") {
        graft.operators.TextAnalysis.lmQualityBucketsFrom(docs).count()
      }
      // audio activity segmentation (q238's shape): q201's single-
      // projection framing + a payload-bounded frame explode +
      // doc-partitioned islands windows — wall must track payload
      // mass linearly (frames ≈ bytes/128 per row, never global).
      time(s"audio_segments") {
        graft.operators.Multimodal.audioSegmentsFrom(docs).count()
      }
      // length batching (q239's shape): the grouped GlobalOrder
      // two-pass — wall must track corpus size linearly with NO
      // per-length-class funnel task (one class dominates any real
      // corpus; the amplified copies all land in their base's class).
      time(s"length_batching") {
        graft.operators.CorpusOps.lengthBatchingFrom(docs).count()
      }
      // RAG build-vs-serve split (q231's point): the one-shot chain
      // (q223) pays the full corpus encode per call; the store-backed
      // serve pays query-encode + probed-cell rank only. Steady-state
      // serve wall must sit well under the one-shot wall and stay flat
      // in corpus mass per probed cell.
      time(s"rag_serve_split") {
        val t0 = System.nanoTime()
        graft.operators.Similarity
          .ragRetrievalFrom(spark, docs, t.embeddings).count()
        val oneShot2 = System.nanoTime()
        graft.operators.Similarity
          .ragRetrievalFrom(spark, docs, t.embeddings).count()
        val t1 = System.nanoTime()
        graft.operators.Similarity
          .ragServeFrom(spark, docs, t.embeddings).count()  // build+serve
        val t2 = System.nanoTime()
        val n = graft.operators.Similarity
          .ragServeFrom(spark, docs, t.embeddings).count()  // steady serve
        val t3 = System.nanoTime()
        println(f"[scale]   rag split: one-shot cold=${(oneShot2 - t0) / 1e9}%.1f s " +
          f"steady=${(t1 - oneShot2) / 1e9}%.1f s; " +
          f"store build+serve=${(t2 - t1) / 1e9}%.1f s " +
          f"steady serve=${(t3 - t2) / 1e9}%.1f s")
        n
      }
      // IVFADC + exact re-rank (q198's shape): the refine adds one
      // broadcast of R×queries shortlist rows over the corpus scan —
      // its cost must track the underlying q159 index pass, and the
      // re-ranked recall must dominate the served-by-ADC recall at
      // every scale (the shortlist-membership argument).
      time(s"ivfadc_rerank") {
        val eh = graft.operators.Similarity
          .ivfAdcRerankTopKFrom(vecs).count()
        eh
      }
      // containment join (q199's shape): amplified copies of one base
      // doc share its grams, so TRUE directed containment pairs grow
      // mult²-per-base (output mass, like q42's dup argument) while the
      // candidate work stays df-bounded per gram under the cap.
      time(s"containment_join") {
        val c = graft.operators.Dedup.containmentJoinFrom(docs)
        val n = c.filter(col("ia").isNotNull).count()
        println(s"[scale]   containment pairs=$n")
        n
      }
      // video temporal near-dup (q217's shape), corpus axis: amplified
      // copies are frame-level near-dups of their base (the copyvariant
      // tail shifts the frame grid), so true pairs grow with the copy
      // families while candidate work stays df-bounded per frame-3-gram
      // — the q199 cap, one level up.
      time(s"video_neardup") {
        val v = graft.operators.Multimodal.videoNearDupFrom(docs)
        val n = v.filter(col("ia").isNotNull).count()
        println(s"[scale]   video pairs=$n")
        n
      }
      // video near-dup, SEQUENCE-LENGTH axis: fixed corpus, payloads
      // repeated mult× (the text repeat shifts the 64-byte frame grid
      // each period, so frames stay distinct) — per-video frame count
      // grows mult×, and cost must track total frame-shingle mass
      // linearly, never frames-per-video².
      time(s"video_neardup_longseq") {
        val longDocs = t.documents.select(col("doc_id"),
          concat_ws(" ", array_repeat(col("text"), mult)).as("text"))
        val v = graft.operators.Multimodal.videoNearDupFrom(longDocs)
        val n = v.filter(col("ia").isNotNull).count()
        println(s"[scale]   video longseq pairs=$n (len x$mult)")
        n
      }
      // perceptual video near-dup (q245's shape): the same two axes as
      // q217 collapse into one probe — the per-frame aHash map is one
      // JVM pass over payload mass, and the funnel inherits q199's
      // df-bounded candidate work; cost must track frame mass linearly.
      time(s"video_perceptual_neardup") {
        val v = graft.operators.Multimodal.videoPerceptualNearDupFrom(docs)
        val n = v.filter(col("ia").isNotNull).count()
        println(s"[scale]   video perceptual pairs=$n")
        n
      }
      // perceptual video near-dup, SEQUENCE-LENGTH axis (q245's second
      // axis — q217's longseq probe with the aHash frame words): fixed
      // corpus, payloads repeated mult× so per-video frame count grows
      // mult×. The aHash adds one JVM map pass over frame mass that the
      // md5 form didn't have; cost must still track total frame-shingle
      // mass linearly, never frames-per-video².
      time(s"video_perceptual_longseq") {
        val longDocs = t.documents.select(col("doc_id"),
          concat_ws(" ", array_repeat(col("text"), mult)).as("text"))
        val v = graft.operators.Multimodal
          .videoPerceptualNearDupFrom(longDocs)
        val n = v.filter(col("ia").isNotNull).count()
        println(s"[scale]   video perceptual longseq pairs=$n (len x$mult)")
        n
      }
      // cross-source duplicate matrix (q174's shape) on a MANY-sources
      // corpus: the join runs on the (digest, source) DISTINCT relation
      // and fans out per digest only over its own source set, so cost
      // tracks corpus size linearly at a fixed source count — and the
      // result stays ≤ sources² rows no matter the amplification.
      time(s"cross_source_matrix") {
        val srcDocs = docs.select(
          concat(lit("src"), pmod(col("doc_id"), lit(20L))).as("source"),
          col("text"))
        val m = graft.operators.CorpusOps.crossSourceDuplicatesFrom(srcDocs)
        val pairs = m.count()
        val shared = m.agg(sum(col("n_shared_digests"))).head().getLong(0)
        println(s"[scale]   cross-source: pairs=$pairs shared=$shared")
        pairs
      }
      // vocabulary spectrum (q177's shape): token explode → term counts
      // → counts-of-counts. The second aggregate runs at VOCABULARY
      // scale (which grows with the mutated copies), the result stays
      // ≤ 11 rows — cost must track the token scan linearly.
      time(s"vocab_spectrum") {
        val s = graft.operators.TextAnalysis.vocabularySpectrumFrom(docs)
        val total = s.agg(sum(col("n_tokens"))).head().getLong(0)
        println(s"[scale]   vocab spectrum: classes=${s.count()} tokens=$total")
        total
      }
      // deterministic hash sampling (q173's shape): one codegen'd map
      // over the text scan + a source-keyed aggregate — zero joins,
      // zero windows; realized per-mille must hug the 160 target for
      // every source at every scale.
      time(s"hash_sampling") {
        val srcDocs = docs.withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20L))))
        val h = graft.operators.CorpusOps.hashSamplingFrom(srcDocs)
        val drift = h.agg(max(abs(col("realized_pm") - 160L))).head().getLong(0)
        println(s"[scale]   hash sampling: sources=${h.count()} max_drift_pm=$drift")
        drift
      }
      // event-transition matrix (q176's shape): one user-partitioned
      // lead() window + a types²-bounded aggregate over the amplified
      // stream — user-parallel, never global.
      time(s"transition_matrix") {
        val tm = graft.operators.Behavioral.eventTransitionsFrom(
          ev.select(col("user_id"), col("ts"), col("event_id"),
            col("event_type")))
        val cells = tm.count()
        println(s"[scale]   transitions: cells=$cells")
        cells
      }
      // HITS (q180's shape): 5 synchronous rounds over the amplified
      // directed graph — two node-keyed sums + two broadcast 1-row
      // maxes per round; must track pagerank_10iter at roughly half the
      // rounds' cost.
      time(s"hits_5round") {
        graft.operators.GraphOps.hitsFrom(de).count()
      }
      // blocked edit-distance linkage (q183's shape): amplified copies
      // share their base doc's 16-char prefix, so blocks hold ~mult
      // members (far under the 64 cap) — pair count grows as
      // C(mult,2)·docs (real near-dup mass, inherently quadratic in
      // copy count) while per-pair work stays the constant 80-char DP.
      time(s"edit_linkage") {
        val l = graft.operators.Dedup.editLinkageFrom(docs)
        val pairs = l.count()
        println(s"[scale]   edit linkage: pairs=$pairs")
        pairs
      }
      // source vocabulary overlap (q185's shape): per-source top-100
      // via WindowGroupLimit, pair join over ≤ sources·100 rows — time
      // must track the term-count scan; output fixed at C(20,2).
      time(s"vocab_overlap") {
        val srcDocs = docs.withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20L))))
        graft.operators.CorpusOps.sourceVocabOverlapFrom(srcDocs).count()
      }
      // perceptual-hash tier (q187/q188's shape): per-partition decode +
      // hash map pass, hash-keyed group, then the banded hamming funnel
      // — both must scale with the payload scan; amplified exact copies
      // collapse into the same hash groups (n_docs grows, hashes don't).
      time(s"image_phash_funnel") {
        val ph = docs
          .withColumn("h",
            floor(octet_length(col("text")) / lit(24)).cast("int"))
          .filter(col("h") >= 8)
          .select(col("doc_id"),
            concat(lit("P6\n8 "), col("h").cast("string"), lit("\n255\n"),
              expr("substring(text, 1, h * 24)")).cast("binary").as("payload"))
        import spark.implicits._
        val hashes = ph.as[(Long, Array[Byte])]
          .mapPartitions(_.flatMap { case (id, p) =>
            graft.operators.Multimodal.PpmDecoder.aHash(id, p) })
          .toDF("doc_id", "phash", "phash64")
        val groups = hashes.groupBy(col("phash")).count().count()
        val nd = graft.operators.Multimodal.imageNearDupFrom(hashes).count()
        println(s"[scale]   phash: distinct_hashes=$groups neardup_pairs=$nd")
        groups
      }
      // robust outliers (q190's shape): two exact grouped medians via
      // the GlobalOrder two-pass — event_type is 5-valued, so the
      // NON-scale shape (type-partitioned window) would sort a fifth of
      // the corpus in one task; this row must scale with the value scan,
      // not with the biggest type's share.
      time(s"robust_outliers") {
        val ro = graft.operators.Behavioral.robustOutliersFrom(
          ev.select(col("event_id"), col("event_type"), col("value")))
        val out = ro.agg(sum(col("n_outliers"))).head().getLong(0)
        println(s"[scale]   robust outliers: types=${ro.count()} flagged=$out")
        out
      }
      // per-vertex attribution (q147's shape): the same oriented wedge
      // join plus an explode + count over TRIANGLE rows — must track the
      // triangle_count row above, not add a new asymptotic term.
      time(s"clustering_coefficient") {
        val cc = graft.operators.GraphOps.clusteringCoefficientFrom(ue)
        val closed = cc.filter(col("n_tri") > 0).count()
        println(s"[scale]   clustering coeff: nodes=${cc.count()} closed=$closed")
        closed
      }
      // grouped global-order (q145's shape): per-source quota cumsum via
      // per-(source, bucket) offsets — the collect is sources × buckets
      // (metadata), so cost must track the scored scan linearly.
      time(s"domain_mixture") {
        val srcDocs = docs.withColumn("source",
          concat(lit("src"), pmod(col("doc_id"), lit(20L))))
        val m = graft.operators.CorpusOps.domainMixtureFrom(srcDocs)
        val sel = m.filter(col("selected")).count()
        println(s"[scale]   domain mixture: docs=${m.count()} selected=$sel")
        sel
      }
      // skew: half the keys collapse onto one hot key (mult×50k rows on a
      // single join key at 10×). AQE's skew splitting is disabled so the
      // comparison isolates the explicit salting pattern (Skew.scala).
      val factSk = ev.select(
        when(col("user_id") % 50 < 25, 0L).otherwise(col("user_id")).as("k"),
        col("value"), col("event_id"))
      val dimSk = factSk.select(col("k")).distinct()
        .withColumn("w", (col("k") % 7).cast("long"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time(s"skew_join_plain")(
        factSk.join(dimSk, Seq("k"))
          .groupBy(col("k")).agg(sum(col("value")), max(col("w"))).count())
      time(s"skew_join_salted") {
        val s = 8L
        val factSalted = factSk.withColumn("salt", pmod(col("event_id"), lit(s)))
        val dimSalted = dimSk.withColumn("salt",
          explode(sequence(lit(0L), lit(s - 1))))
        factSalted.join(dimSalted, Seq("k", "salt"))
          .groupBy(col("k")).agg(sum(col("value")), max(col("w"))).count()
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // true-stream throughput: the amplified events pushed through the
      // tumbling-window aggregation as a real micro-batch run (MemoryStream
      // feed is driver-side test scaffolding; the measured work is the
      // streaming engine's stateful aggregation)
      val evRows = ev.select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .collect()
        .map(r => SmokeEv(r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
        .toSeq
      time(s"stream_tumbling") {
        import spark.implicits._
        implicit val ctx = spark.sqlContext
        val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SmokeEv]
        // bounded micro-batches (500k events each): a MemoryStream batch
        // is serialized whole into the task binary, so one 2M-row batch
        // OOMs an 8g driver — and real streams arrive in bounded batches
        // anyway; the measured work is the stateful aggregation across
        // batches either way
        val q = graft.streaming.EventStreams
          .tumblingAgg(ms.toDF().withWatermark("ts", "1 hour"))
          .writeStream.format("memory").queryName(s"smoke_tumbling_$mult")
          .outputMode("complete").start()
        try {
          // chunk size tunable for the sustained-rate probe: smaller
          // chunks → more micro-batches over the same event volume
          val chunkSz = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNK",
            "500000").toInt
          // accumulate progress per chunk (dedup by batch id): a long
          // run would silently lose its earliest batches to
          // recentProgress's 100-entry retention cap otherwise
          val progress = scala.collection.mutable.LinkedHashMap[
            Long, org.apache.spark.sql.streaming.StreamingQueryProgress]()
          evRows.grouped(chunkSz).foreach { chunk =>
            ms.addData(chunk); q.processAllAvailable()
            q.recentProgress.foreach(p => progress.update(p.batchId, p))
          }
          // sustained-rate evidence: per-batch trigger latency and state
          // rows must stay FLAT across the run — growth in either means
          // per-batch cost depends on history, which no streaming
          // deployment survives
          progress.valuesIterator.foreach { p =>
            val stateRows = p.stateOperators.headOption
              .map(_.numRowsTotal).getOrElse(-1L)
            println(s"[scale]   stream batch=${p.batchId} " +
              s"rows=${p.numInputRows} " +
              s"latency_ms=${p.durationMs.get("triggerExecution")} " +
              s"state_rows=$stateRows")
          }
          spark.table(s"smoke_tumbling_$mult").count()
        }
        finally q.stop()
      }
    }
    spark.stop()
  }
}
