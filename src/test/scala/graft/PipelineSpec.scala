package graft

import graft.functions.PolyHash.poly_hash
import graft.functions.SimHash64.simhash64
import graft.operators.{Dedup, GraphOps, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-behavior tests for the operators that ship without a SQL oracle
  * (SparkEntry.rowsOnlyQueries) + the custom Catalyst expressions.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("poly_hash: codegen'd expression is deterministic and seed-sensitive") {
    import spark.implicits._
    val df = Seq("hello", "hello", "world", "").toDF("s")
      .select(poly_hash(col("s"), lit(0L)).as("h0"),
        poly_hash(col("s"), lit(1L)).as("h1"))
    val rows = df.collect()
    assert(rows(0) == rows(1))                 // deterministic
    assert(rows(0).getLong(0) != rows(0).getLong(1)) // seeds differ
    assert(rows(0).getLong(0) != rows(2).getLong(0)) // inputs differ
    // interpreted eval agrees with codegen
    val interp = graft.functions.PolyHash(
      org.apache.spark.sql.catalyst.expressions.Literal.create("hello"),
      org.apache.spark.sql.catalyst.expressions.Literal.create(0L)).eval(null)
    assert(interp == rows(0).getLong(0))
  }

  test("simhash64: near-identical token streams have small Hamming distance") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i")
    val similar = base.updated(5, "CHANGED")
    val different = (1 to 60).map(i => s"other$i")
    val df = Seq(base, similar, different).toDF("toks")
      .select(simhash64(col("toks")).as("h"))
    val Array(h1, h2, h3) = df.collect().map(_.getLong(0))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h1, h2) < hamming(h1, h3))
    assert(hamming(h1, h2) <= 16)
    // interpreted matches codegen
    val toks = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      base.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
    assert(graft.functions.SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        base, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))).eval(
      org.apache.spark.sql.catalyst.InternalRow.empty) == h1)
  }

  test("custom expressions are callable from SQL after registration") {
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    Tables(spark, sf).documents.createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, poly_hash(text, 0) AS fp,
        |       simhash64(split(lower(text), ' ')) AS sh
        |FROM docs_sql ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    val viaApi = Tables(spark, sf).documents
      .select(col("doc_id"), poly_hash(col("text"), lit(0L)).as("fp"),
        simhash64(split(lower(col("text")), " ")).as("sh"))
      .orderBy(col("doc_id")).limit(5).collect()
    assert(viaSql.map(_.toSeq.toList).toList == viaApi.map(_.toSeq.toList).toList)
    val agg = spark.sql(
      "SELECT minhash_sig(substring(text, 1, 8)) FROM docs_sql").head()
    assert(agg.getSeq[Long](0).length == 64)
    val wf = spark.sql(
      "SELECT winnow_fps(lower(text)) AS fps FROM docs_sql WHERE doc_id = 0").head()
    val wfApi = Dedup.winnowFingerprintSetsFrom(
      Tables(spark, sf).documents.filter(col("doc_id") === 0L)).head()
    assert(wf.getSeq[Long](0).toSet == wfApi.getSeq[Long](1).toSet)
  }

  test("GraftExtensions: spark.sql.extensions registers the custom functions") {
    // the spark-submit deployment path: spark.sql.extensions is a STATIC
    // conf on the SparkContext (set in SparkTestSession), and every
    // session built over that context gets the functions injected into
    // its own fresh registry — bridge.registerFunctions calls on other
    // sessions cannot leak in (temp-function registries are
    // session-local), so resolution here proves the extension ran
    import org.apache.spark.sql.SparkSession
    val orig = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().getOrCreate()
      assert(s2 ne orig)
      val r = s2.sql(
        "SELECT poly_hash('hello', 0) AS h, simhash64(array('a','b')) AS s").head()
      val direct = graft.functions.PolyHash(
        org.apache.spark.sql.catalyst.expressions.Literal.create("hello"),
        org.apache.spark.sql.catalyst.expressions.Literal.create(0L)).eval(null)
      assert(r.getLong(0) == direct)
      // do NOT s2.stop(): the SparkContext is shared with the suite session
    } finally {
      SparkSession.setDefaultSession(orig); SparkSession.setActiveSession(orig)
    }
  }

  test("GraftExtensions strict mode rejects unpartitioned windows at analysis time") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.expressions.Window
    val orig = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().getOrCreate()
      import s2.implicits._
      val df = Seq((1L, 10L), (2L, 5L)).toDF("id", "v")
      def globalRank() = df
        .withColumn("r", org.apache.spark.sql.functions.rank()
          .over(Window.orderBy(col("v"))))
        .collect()
      def keyedRank() = df
        .withColumn("r", org.apache.spark.sql.functions.rank()
          .over(Window.partitionBy(col("id")).orderBy(col("v"))))
        .collect()
      s2.conf.set("spark.graft.strictWindows", "true")
      try {
        val e = intercept[org.apache.spark.sql.AnalysisException](globalRank())
        assert(e.getMessage.contains("unpartitioned window"), e.getMessage)
        assert(keyedRank().length == 2) // partitioned windows unaffected
        // a global window hiding inside a subquery expression is caught too
        df.createOrReplaceTempView("strict_t")
        val e2 = intercept[org.apache.spark.sql.AnalysisException](s2.sql(
          """SELECT * FROM strict_t WHERE v > (
            |  SELECT max(r) FROM (
            |    SELECT rank() OVER (ORDER BY v) AS r FROM strict_t))""".stripMargin)
          .collect())
        assert(e2.getMessage.contains("unpartitioned window"), e2.getMessage)
      } finally s2.conf.set("spark.graft.strictWindows", "false")
      assert(globalRank().length == 2) // default: allowed (lint is opt-in)
    } finally {
      SparkSession.setDefaultSession(orig); SparkSession.setActiveSession(orig)
    }
  }

  test("minhash LSH funnel is sane") {
    val row = Dedup.minhashLshSummary(spark, sf).head()
    val (nDocs, nCand, nDup) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nDocs == 500)
    assert(nCand >= 0 && nCand < nDocs * (nDocs - 1) / 2) // sub-quadratic
    assert(nDup <= nCand)
  }

  test("minhash LSH finds planted near-duplicates") {
    // derive a corpus with 100 planted near-dups: each doc gets a copy
    // whose tail is replaced (true Jaccard ≈ 0.9)
    val base = Tables(spark, sf).documents
      .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
    val mutated = base
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 20)"),
          lit(" zz mutated tail zz")).as("text"))
    val corpus = base.union(mutated)
    val row = Dedup.minhashLshSummaryFrom(corpus).head()
    val (nDocs, nCand, nDup) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nDocs == 200)
    assert(nDup >= 90, s"planted 100 near-dup pairs, LSH verified only $nDup " +
      s"(candidates: $nCand)")
    assert(nCand < 200L * 199 / 2, "candidate generation went quadratic")
  }

  test("simhash banding finds planted near-duplicates") {
    val base = Tables(spark, sf).documents
      .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
    // token-level mutation: change the last 2 words of ~60-100
    val mutated = base
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat_ws(" ",
          slice(split(col("text"), " "), lit(1), size(split(col("text"), " ")) - lit(2)),
          lit("mutated tokens")).as("text"))
    val corpus = base.union(mutated)
    val row = Dedup.simhashNearDupSummaryFrom(Dedup.fingerprintsFrom(corpus)).head()
    val (nCand, nNear) = (row.getLong(0), row.getLong(1))
    assert(nNear >= 80, s"planted 100 simhash near-dups, found $nNear " +
      s"(candidates: $nCand)")
  }

  test("simhash near-dup summary is sane") {
    val row = Dedup.simhashNearDupSummary(spark, sf).head()
    assert(row.getLong(0) >= row.getLong(1))
  }

  test("bucket guard bounds a degenerate corpus; planted dups still found") {
    // 300 byte-identical documents: every band bucket holds all 300 docs,
    // so unguarded candidate generation is exactly quadratic — the LSH
    // worst case no banding can fix. The guard must (a) bound it, (b)
    // report the skipped mass, (c) leave small buckets (real near-dups)
    // untouched.
    val text = Tables(spark, sf).documents
      .filter(col("doc_id") === 0L).head().getAs[String]("text")
    val degen = spark.range(300)
      .select(col("id").as("doc_id"), lit(text).as("text"))
    val quad = 300L * 299 / 2

    // unguarded (default cap 1000 > 300): the quadratic blowup is real
    val off = Dedup.minhashLshSummaryFrom(degen).head()
    assert(off.getLong(1) == quad, s"expected full quadratic candidates: $off")
    assert(off.getLong(3) == 0L && off.getLong(4) == 0L)

    // guarded: zero candidates, mass reported (16 bands × 300 docs) —
    // and the exact-dedup escalation still collapses the byte-identical
    // mass: 299 of 300 counted as escalated dups
    val on = Dedup.minhashLshSummaryFrom(degen, maxBucket = 100).head()
    assert(on.getLong(1) == 0L, s"guard leaked candidates: $on")
    assert(on.getLong(3) == 16L && on.getLong(4) == 16L * 300)
    assert(on.getLong(5) == 299L, s"escalation missed the identical mass: $on")
    assert(off.getLong(5) == 0L, "no hot buckets => nothing escalated")

    // mixed corpus: the degenerate mass is capped but a planted near-dup
    // pair OUTSIDE the hot buckets is still found
    val pair = Tables(spark, sf).documents
      .filter(col("doc_id") === 1L).select(col("doc_id"), col("text"))
    val pairDup = pair.select((col("doc_id") + 100000L).as("doc_id"),
      concat(expr("substring(text, 1, length(text) - 20)"),
        lit(" zz mutated tail zz")).as("text"))
    val mixed = Dedup
      .minhashLshSummaryFrom(degen.union(pair).union(pairDup), maxBucket = 100)
      .head()
    assert(mixed.getLong(2) >= 1L, s"guard swallowed the planted pair: $mixed")
    assert(mixed.getLong(1) < quad / 10, s"candidates not bounded: $mixed")

    // simhash funnel: same degenerate corpus, same guarantee (4 bands);
    // identical texts share the full 64-bit fingerprint, so the
    // escalation rung counts 299 fingerprint-exact dups
    val sOn = Dedup
      .simhashNearDupSummaryFrom(Dedup.fingerprintsFrom(degen), maxBucket = 100)
      .head()
    assert(sOn.getLong(0) == 0L && sOn.getLong(2) == 4L && sOn.getLong(3) == 4L * 300)
    assert(sOn.getLong(4) == 299L, s"simhash escalation missed: $sOn")

    // embedding funnel: 300 identical vectors land in one bucket per table
    val vec = Tables(spark, sf).embeddings
      .filter(col("vec_id") === 0L).select(col("embedding"))
    val degenVecs = spark.range(300).crossJoin(vec)
      .select(col("id").as("vec_id"), col("embedding"))
    val eOn = Similarity
      .embeddingNearDupSummaryFrom(degenVecs, 0.9, maxBucket = 100).head()
    assert(eOn.getLong(1) == 0L, s"guard leaked embedding candidates: $eOn")
    assert(eOn.getLong(3) == 4L && eOn.getLong(4) == 4L * 300)
    assert(eOn.getLong(5) == 299L, s"embedding escalation missed: $eOn")
    val eOff = Similarity
      .embeddingNearDupSummaryFrom(degenVecs, 0.9).head()
    assert(eOff.getLong(1) == quad && eOff.getLong(2) == quad)

    // the ACTION tier inherits the rung: even with every band bucket
    // over cap, the keep-list still collapses the identical mass to its
    // minimum id via the escalated exact-dup pairs
    val keep = Dedup.fuzzyDedupKeepFrom(spark, degen, maxBucket = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep.size == 300 && keep.values.forall(_ == 0L),
      s"escalated pairs must reach the keep-list: ${keep.values.toSet}")
  }

  test("semantic dedup drops planted duplicates; the cell guard is conservative") {
    val base = Tables(spark, sf).embeddings.select(col("vec_id"), col("embedding"))
    // plant an exact copy of vector 3: same cell, cosine exactly 1 —
    // the keep-lowest-id rule must drop the copy and keep the original
    val copy = base.filter(col("vec_id") === 3L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val decisions = Similarity.semanticDedupFrom(base.union(copy), tau = 0.35)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(decisions(3L), "the lower-id original must be kept")
    assert(!decisions(100003L), "the planted exact copy must be dropped")
    assert(decisions.size == 501, s"decision table must cover every vector")
    // guard + escalation: with maxCell = 1 every cell is hot, so no
    // PAIRWISE comparisons run — but the escalation rung still drops the
    // planted exact copy (identical embedding ⇒ cosine 1, evidence-backed)
    // while every non-identical vector stays conservative-kept
    val guarded = Similarity.semanticDedupFrom(base.union(copy), tau = 0.35,
      maxCell = 1).collect()
    val gMap = guarded.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!gMap(100003L), "escalation must drop the exact copy in a hot cell")
    assert(gMap(3L), "the lower-id original must be kept")
    // with maxCell = 1 no pairwise compare runs, so every drop must come
    // from the escalation rung (and be flagged as such)
    assert(guarded.filter(!_.getBoolean(2)).forall(_.getBoolean(3)),
      "non-escalated rows must not be dropped when every cell is guarded")
    // two-level (hierarchical) assignment: identical vectors evaluate
    // identical expressions, so exact copies still co-locate and drop —
    // the O(N·2√K) scale path must not lose recall on exact dups
    val two = Similarity.semanticDedupFrom(base.union(copy), tau = 0.35,
      k = 64, twoLevel = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val twoMap = two.map(r => r._1 -> r._3).toMap
    assert(twoMap(3L) && !twoMap(100003L),
      "two-level path must keep the original and drop the exact copy")
    val cells = two.map(r => r._1 -> r._2).toMap
    assert(cells(3L) == cells(100003L), "exact copies must share a cell")
    assert(cells.values.forall(c => c >= 1L && c <= 64L),
      s"cells must be global 1-based centroid indices: ${cells.values.toSet}")
  }

  test("escalation collapses an over-cap cell of identical vectors to one") {
    // the SemDeDup worst case the conservative guard used to punt on: a
    // hot cell that is 100% duplicates. 1001 identical vectors blow past
    // maxCell = 1000, the pairwise compare is skipped, and the exact-
    // match escalation must keep EXACTLY the lowest id.
    val one = Tables(spark, sf).embeddings
      .filter(col("vec_id") === 0L).select(col("embedding"))
    val degen = spark.range(1001).crossJoin(one)
      .select(col("id").as("vec_id"), col("embedding"))
    val rest = Tables(spark, sf).embeddings
      .filter(col("vec_id") >= 1L && col("vec_id") < 50L)
      .select((col("vec_id") + 2000L).as("vec_id"), col("embedding"))
    val dec = Similarity.semanticDedupFrom(degen.union(rest), tau = 0.35)
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3)))
    val degenRows = dec.filter(_._1 < 1001L)
    assert(degenRows.length == 1001 && degenRows.forall(_._3),
      "the duplicated mass must land in one escalated hot cell")
    assert(degenRows.filter(_._2).map(_._1).toSeq == Seq(0L),
      s"exactly vec 0 kept of 1001 identical: ${degenRows.count(_._2)} kept")
    // funnel summaries report the same rung: 1000 of the 1001 identical
    // embeddings count as escalated dups in the near-dup summary
    val esc = Similarity
      .embeddingNearDupSummaryFrom(degen.union(rest), 0.9, maxBucket = 500)
      .head()
    assert(esc.getLong(5) == 1000L,
      s"n_escalated must count the collapsed identical mass: $esc")
  }

  test("two-level assignment survives an empty super: no vector is dropped") {
    import spark.implicits._
    // Engineer the ADVICE scenario: centroid 2 is a ZERO-norm direction,
    // so it maps to super 1 (all-zero scores, first-max) and — because a
    // zero super-direction scores 0 against every centroid while super 1
    // ties it at 0 and wins first-max — NO centroid maps to super 2. A
    // probe vector anti-aligned with supers 1/3/4 then argmaxes to the
    // empty super 2 (its only non-negative score); before the present-
    // super restriction the inner join silently dropped it.
    def unit(d: Int): Array[Float] = Array.tabulate(64)(i => if (i == d) 1f else 0f)
    val cents: Seq[(Long, Array[Float])] =
      (1L, unit(0)) +: (2L, Array.fill(64)(0f)) +: (3L, unit(1)) +: (4L, unit(2)) +:
        (5L to 16L).map(i => (i, unit(i.toInt + 1)))
    val probe = (100L, Array.tabulate(64)(i => if (i <= 2) -1f else 0f))
    val vecs = (cents :+ probe).toDF("vec_id", "embedding")
    val dec = Similarity.semanticDedupFrom(vecs, tau = 0.35, twoLevel = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // 16 fixture vectors + probe, minus the zero-norm vector 2 = 16 rows
    assert(dec.length == 16,
      s"one row per non-zero-norm vector, got ${dec.map(_._1).toSeq.sorted}")
    assert(dec.exists(_._1 == 100L), "the empty-super probe must not be dropped")
    assert(dec.forall { case (_, c, _) => c >= 1L && c <= 16L },
      s"cells must be global 1-based centroid indices")
  }

  test("fuzzy dedup keep-list collapses transitive near-dup chains") {
    val a = Tables(spark, sf).documents
      .filter(col("doc_id") === 1L).select(col("doc_id"), col("text"))
    // chain: b mutates a's tail, c mutates b's tail again — a~b and b~c
    // are near-dups; connected components must give all three ONE
    // canonical (the minimum id) whether or not a~c also banded
    val b = a.select((col("doc_id") + 100000L).as("doc_id"),
      concat(expr("substring(text, 1, length(text) - 20)"),
        lit(" zz mutated tail zz")).as("text"))
    val c = b.select((col("doc_id") + 100000L).as("doc_id"),
      concat(expr("substring(text, 1, length(text) - 20)"),
        lit(" yy another tail yy")).as("text"))
    val rest = Tables(spark, sf).documents
      .filter(col("doc_id") =!= 1L && col("doc_id") < 50L)
      .select(col("doc_id"), col("text"))
    val keep = Dedup.fuzzyDedupKeepFrom(spark, a.union(b).union(c).union(rest))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep(1L) == 1L && keep(100001L) == 1L && keep(200001L) == 1L,
      s"chain must collapse to canonical 1: ${keep.view.filterKeys(_ % 100000 == 1).toMap}")
    // corpus = chain(3) + 49 other docs; the fixture's own planted
    // near-dups (e.g. 12 -> 8) may also collapse — that is correct
    assert(keep.size == 52, "every document must appear in the keep-list")
    // untouched docs are their own canonical (no false merges)
    assert(keep(17L) == 17L, s"unrelated doc remapped: ${keep(17L)}")
  }

  test("fuzzy dedup keep-list on a dup-free corpus is the identity") {
    // no candidate survives the agree >= 32 rule -> the pair graph is
    // empty and the GraphX component step must degrade to a no-op
    // (every doc its own canonical), not crash on an empty edge set
    val distinctDocs = Tables(spark, sf).documents
      .filter(col("doc_id") < 20L).select(col("doc_id"),
        concat(col("doc_id").cast("string"), lit(" totally distinct "),
          md5(col("doc_id").cast("string"))).as("text"))
    val keep = Dedup.fuzzyDedupKeepFrom(spark, distinctDocs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(keep.length == 20 && keep.forall { case (d, c) => d == c },
      s"dup-free corpus must map every doc to itself: ${keep.filterNot { case (d, c) => d == c }.toSeq}")
  }

  test("leakage-safe split: components move whole, rule replays the Knuth uniform") {
    // same planted transitive chain as the keep-list spec: 1 ~ 100001 ~
    // 200001 must all land on ONE side of the split boundary
    val a = Tables(spark, sf).documents
      .filter(col("doc_id") === 1L).select(col("doc_id"), col("text"))
    val b = a.select((col("doc_id") + 100000L).as("doc_id"),
      concat(expr("substring(text, 1, length(text) - 20)"),
        lit(" zz mutated tail zz")).as("text"))
    val c = b.select((col("doc_id") + 100000L).as("doc_id"),
      concat(expr("substring(text, 1, length(text) - 20)"),
        lit(" yy another tail yy")).as("text"))
    val rest = Tables(spark, sf).documents
      .filter(col("doc_id") =!= 1L && col("doc_id") < 50L)
      .select(col("doc_id"), col("text"))
    val rows = Dedup.leakageSafeSplitFrom(spark, a.union(b).union(c).union(rest))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = rows.map(r => r._1 -> r).toMap
    assert(Set(byDoc(1L), byDoc(100001L), byDoc(200001L)).map(_._3).size == 1,
      s"near-dup chain split across the boundary: ${rows.filter(_._2 == 1L).toSeq}")
    // every row replays the JVM rule on its canonical id
    def knuth(c: Long): Long =
      (((c % 4294967296L) / 65536 * 2654435761L % 65536) * 65536
        + (c % 65536) * 2654435761L) % 4294967296L
    def rule(c: Long): String = {
      val h = knuth(c) % 100
      if (h < 90) "train" else if (h < 95) "validation" else "test"
    }
    val bad = rows.filterNot { case (_, canon, s) => s == rule(canon) }
    assert(bad.isEmpty, s"split disagrees with the hash rule: ${bad.take(3).toSeq}")
    // determinism under growth: a singleton's side depends only on its id
    assert(byDoc(17L)._3 == rule(17L))
  }

  test("repeated-segment removal strips planted boilerplate everywhere, keeps unique text") {
    import spark.implicits._
    // 30 docs: a shared 10-word boilerplate header (planted in every
    // doc) followed by a unique 20-word body. The header segment appears
    // in 30 distinct docs >= minDocs=2, so it must vanish from EVERY
    // document; the body segments are unique and must survive verbatim
    // and in order.
    val boiler = (1 to 10).map(_ => "boilerplate").mkString(" ")
    val docs = (0L until 30L).map { i =>
      val body = (0 until 20).map(j => s"unique${i}w$j").mkString(" ")
      (i, s"$boiler $body")
    }.toDF("doc_id", "text")
    val out = Dedup.repeatedSegmentRemovalFrom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.length == 30, "every document must appear")
    out.foreach { case (i, nSeg, nDrop, cleaned) =>
      assert(nSeg == 3L, s"doc $i: 30 words = 3 segments, got $nSeg")
      assert(nDrop == 1L, s"doc $i: exactly the boilerplate segment drops, got $nDrop")
      val body = (0 until 20).map(j => s"unique${i}w$j").mkString(" ")
      assert(cleaned == body, s"doc $i: body must survive verbatim in order")
    }
    // a doc that is ALL boilerplate cleans to the empty string; a unique
    // doc is untouched
    val edge = Seq((100L, boiler), (101L, "entirely unique words here"))
      .toDF("doc_id", "text")
    val out2 = Dedup.repeatedSegmentRemovalFrom(docs.union(edge))
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(out2(100L) == "", "all-boilerplate doc must clean to empty")
    assert(out2(101L) == "entirely unique words here",
      "unique doc must be untouched")
    // null-text parity with the pre-r20 assembly: a null text produced
    // no exploded segments/tokens, so q137 coalesced every column
    // (0/0/"") and q193 kept n_tokens/n_dropped NULL with cleaned ""
    val withNull = docs.union(Seq((200L, null: String)).toDF("doc_id", "text"))
    val segRow = Dedup.repeatedSegmentRemovalFrom(withNull)
      .filter(col("doc_id") === 200L).collect().head
    assert(segRow.getLong(1) == 0L && segRow.getLong(2) == 0L &&
      segRow.getString(3) == "", s"q137 null-text row: $segRow")
    val spanRow = Dedup.spanDedupCleanFrom(withNull)
      .filter(col("doc_id") === 200L).collect().head
    assert(spanRow.isNullAt(1) && spanRow.isNullAt(2) &&
      spanRow.getString(3) == "", s"q193 null-text row: $spanRow")
  }

  test("PII redaction scrubs planted emails/IPs/phones, counts per class, keeps clean text") {
    import spark.implicits._
    val docs = Seq(
      (0L, "contact alice.smith+x@example.co.uk or bob@test.org today"),
      (1L, "server at 192.168.1.254 and 10.0.0.1 responded"),
      (2L, "call 555-867-5309 or 555.123.4567 now"),
      (3L, "mixed: a@b.io from 8.8.8.8 dialed 111-222-3333"),
      (4L, "no pii here just plain words"),
      (5L, "version 1.2 and section 3.4.5 are not addresses")).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedactFrom(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    assert(out(0L) == ((2L, 0L, 0L,
      "contact <EMAIL> or <EMAIL> today")))
    assert(out(1L) == ((0L, 2L, 0L, "server at <IP> and <IP> responded")))
    assert(out(2L) == ((0L, 0L, 2L, "call <PHONE> or <PHONE> now")))
    assert(out(3L) == ((1L, 1L, 1L, "mixed: <EMAIL> from <IP> dialed <PHONE>")))
    assert(out(4L) == ((0L, 0L, 0L, "no pii here just plain words")),
      "clean text must pass through untouched")
    assert(out(5L) == ((0L, 0L, 0L,
      "version 1.2 and section 3.4.5 are not addresses")),
      "short dotted numbers must not match the IPv4 pattern")
  }

  test("TF-IDF top terms rank rare terms above ubiquitous ones; score is exact fixed-point") {
    import spark.implicits._
    // 4 docs; "common" appears in all 4 (df=N -> idf=0 -> tfidf_q=0);
    // each doc has a unique term (df=1 -> idf=ln 4) and doc 0 repeats
    // its unique term twice (tf=2 doubles the score).
    val docs = Seq(
      (0L, "common rare0 rare0 filler"),
      (1L, "common rare1 filler filler"),
      (2L, "common rare2 pad"),
      (3L, "common rare3 pad")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopKFrom(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == Set(0L, 1L, 2L, 3L))
    byDoc.foreach { case (_, rows) => assert(rows.length == 2) }
    val ln4q = math.floor(math.log(4.0) * 1e4).toLong   // 13862
    val ln2q = math.floor(math.log(2.0) * 1e4).toLong   //  6931
    // doc 0: rare0 tf=2 df=1 -> floor(2·ln4·1e4); filler df=2 -> ln2
    assert(out.contains((0L, "rare0", 2L, 1L,
      math.floor(2.0 * math.log(4.0) * 1e4).toLong)))
    assert(out.contains((0L, "filler", 1L, 2L, ln2q)))
    // doc 1: rare1 beats filler (tf=2·ln2 vs 1·ln4: 2ln2 == ln4 exactly
    // in the reals but as floored fixed-point both are 13862; tie-break
    // by term puts filler first alphabetically — both rows survive k=2)
    assert(out.contains((1L, "rare1", 1L, 1L, ln4q)))
    // docs 2/3: unique term tops, "pad" (df=2) second; "common" (df=4,
    // idf=0, tfidf_q=0) never makes top-2
    assert(out.contains((2L, "rare2", 1L, 1L, ln4q)))
    assert(out.contains((2L, "pad", 1L, 2L, ln2q)))
    assert(!out.exists(_._2 == "common"),
      "a term present in every document has idf 0 and must rank last")
  }

  test("Jaccard join: boundary pair included, sub-threshold excluded, prefix filter is exact") {
    import spark.implicits._
    // planted: A={a b c d e}, B={a b c d} -> jac = 4/5 = tau exactly
    // (must be INCLUDED: >= is closed); C={a b c} vs A -> 3/5 excluded;
    // D disjoint.
    val docs = Seq(
      (0L, "a b c d e"), (1L, "a b c d"), (2L, "a b c"),
      (3L, "x y z w v")).toDF("doc_id", "text")
    val out = Dedup.jaccardJoinFrom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSet == Set((0L, 1L, 4L, 5L, 4L, 800000L)),
      s"exactly the boundary pair must survive, got ${out.toSet}")

    // exactness: prefix-filtered result == definitional all-pairs on a
    // deterministic pseudo-random corpus (hash-derived token subsets of
    // a 12-word vocabulary — dense enough that many pairs are near tau)
    val vocab = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11".split(" ")
    val corpus = (0L until 60L).map { i =>
      val toks = vocab.zipWithIndex.filter { case (_, j) =>
        ((i * 2654435761L + j * 40503L) % 97) % 5 != 0 } // ~80% density
      (i, toks.map(_._1).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Dedup.jaccardJoinFrom(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val toks = corpus.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term")).distinct()
    val sz = toks.groupBy("doc_id").count()
    val brute = toks.alias("a").join(toks.alias("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("ia"), col("count").as("na")), "ia")
      .join(sz.select(col("doc_id").as("ib"), col("count").as("nb")), "ib")
      .filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 4)
      .select("ia", "ib", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "fixture must actually exercise the threshold")
    assert(fast == brute,
      s"prefix filter must be exact: missing=${brute -- fast} extra=${fast -- brute}")
  }

  test("shard assignment: positions contiguous per shard, token offsets telescope, permutation is unbiased-ish") {
    val out = graft.operators.CorpusOps
      .shardAssignment(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length == 500)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.size == 32, "500 docs must touch all 32 shards")
    byShard.foreach { case (s, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to rows.length).toSeq,
        s"shard $s: positions must be contiguous from 1")
      // exclusive prefix: offset(k) = offset(k-1) + n_tokens(k-1), from 0
      sorted.foldLeft(0L) { case (expect, (_, _, _, nTok, off)) =>
        assert(off == expect, s"shard $s: token offsets must telescope")
        expect + nTok
      }
      // crude balance check: hash sharding of 500 docs over 32 shards
      // should land every shard within [3, 35] docs (mean ~15.6)
      assert(rows.length >= 3 && rows.length <= 35,
        s"shard $s has ${rows.length} docs — permutation badly skewed")
    }
  }

  test("chunk windows: 50% overlap, full coverage, clamped tail, short docs in one chunk") {
    import spark.implicits._
    val words100 = (0 until 100).map(i => s"w$i")
    val docs = Seq(
      (0L, words100.mkString(" ")),          // 100 words -> 4 chunks
      (1L, (0 until 50).map(i => s"v$i").mkString(" ")), // 50 -> 2 chunks
      (2L, "tiny doc")).toDF("doc_id", "text") // 2 words -> 1 chunk
    val out = graft.operators.CorpusOps.chunkWindowsFrom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val d0 = out.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d0.map(_._3).toSeq == Seq(40L, 40L, 40L, 40L))
    assert(d0(0)._4.startsWith("w0 w1 ") && d0(1)._4.startsWith("w20 "),
      "stride must be 20 tokens")
    // consecutive chunks share exactly 20 tokens (50% overlap)
    val c0 = d0(0)._4.split(" ").toSet; val c1 = d0(1)._4.split(" ").toSet
    assert((c0 & c1).size == 20)
    // every token of the doc appears in some chunk
    assert(d0.flatMap(_._4.split(" ")).toSet == words100.toSet)
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq(40L, 30L),
      "tail chunk must clamp at the document end")
    assert(out.filter(_._1 == 2L).map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 2L, "tiny doc")), "short docs chunk to themselves")
  }

  test("unigram surprisal: exact fixed-point values; rare-token docs outscore common-token docs") {
    import spark.implicits._
    // corpus: "common" x 8 across docs, "rare" once; doc 2 is all-common
    val docs = Seq(
      (0L, "common common rare"),
      (1L, "common common common"),
      (2L, "common common common")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisalFrom(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // T = 9 tokens; cnt(common) = 8, cnt(rare) = 1
    val qCommon = math.floor(math.log(9.0 / 8) * 1e4).toLong
    val qRare = math.floor(math.log(9.0) * 1e4).toLong
    assert(out(0L) == ((3L, 2 * qCommon + qRare, (2 * qCommon + qRare) / 3)))
    assert(out(1L) == ((3L, 3 * qCommon, qCommon)))
    assert(out(0L)._3 > out(1L)._3,
      "the rare-token document must have higher mean surprisal")
    assert(out(1L) == out(2L), "identical docs must score identically")
  }

  test("DSIR importance: exact brute-force replay; target-like docs outrank off-target docs") {
    import spark.implicits._
    // target slice (doc_id % 5 == 0) speaks alpha/beta; raw docs either
    // mimic the target vocabulary or speak omega — the mimics must win
    val corpus = Seq(
      (0L, "alpha beta alpha beta"),
      (5L, "alpha alpha beta"),
      (1L, "alpha beta alpha"),
      (2L, "omega omega omega"),
      (3L, "alpha omega beta"))
    val out = graft.operators.CorpusOps
      .dsirImportanceFrom(corpus.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force replay: same FNV buckets, same add-one LLR, same
    // floor-before-sum quantization, same (dsir_q DESC, doc_id) order
    val B = 256
    def bucket(t: String): Long = {
      val h = graft.functions.MinHashSig.fnv(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      ((h % B) + B) % B
    }
    val toks = corpus.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => id -> bucket(w)) }
    val tgt = toks.filter(_._1 % 5 == 0)
    val raw = toks.filter(_._1 % 5 != 0)
    val ctM = tgt.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val crM = raw.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (t, r) = (tgt.size.toLong, raw.size.toLong)
    def sq(b: Long): Long = math.floor(math.log(
      ((ctM.getOrElse(b, 0L) + 1).toDouble / (t + B))
        / ((crM(b) + 1).toDouble / (r + B))) * 1e4).toLong
    val want = raw.groupBy(_._1).map { case (id, ts) =>
      (id, ts.size.toLong, ts.map(x => sq(x._2)).sum) }
      .toSeq.sortBy { case (id, _, q) => (-q, id) }
    assert(out.toSeq == want, s"got ${out.toSeq}\nwant $want")
    val byId = out.map(x => x._1 -> x._3).toMap
    assert(byId(1L) > byId(2L), "target-like doc must outscore off-target")
  }

  test("fixed-point k-means matches an in-memory Lloyd model and separates planted blobs") {
    import spark.implicits._
    // 3 planted blobs of 10 vectors in 4 dims; deterministic offsets
    val centers = Seq(Seq(0.4f, 0.4f, -0.2f, 0.0f),
      Seq(-0.4f, 0.1f, 0.3f, -0.3f), Seq(0.0f, -0.4f, -0.4f, 0.4f))
    val vecs = (0 until 30).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.zipWithIndex.map { case (x, d) =>
        x + ((i * 7 + d * 3) % 5 - 2) * 0.01f })
    }
    val out = Similarity.kmeansCellsFrom(
        vecs.toDF("vec_id", "embedding"), k = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // in-memory replica of the exact fixed-point semantics
    val eq = vecs.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 1e6).toLong).toArray }
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Array[Array[Long]]) = eq.map { case (id, e) =>
      val ds = cents.map(dist(e, _))
      (id, ds.indexOf(ds.min).toLong, ds.min)
    }
    var cents = eq.sortBy(_._1).take(3).map(_._2).toArray
    for (_ <- 1 to 3) {
      val byCell = assign(cents).zip(eq).groupBy(_._1._2)
      cents = cents.indices.map { j =>
        byCell.get(j.toLong) match {
          case Some(rows) =>
            val es = rows.map(_._2._2)
            es.head.indices.map(d => math.floor(
              es.map(_(d)).sum.toDouble / es.size).toLong).toArray
          case None => cents(j)
        }
      }.toArray
    }
    val want = assign(cents).toSet
    assert(out.toSet == want,
      s"missing=${want -- out.toSet} extra=${out.toSet -- want}")
    // blob purity: each planted blob lands in one cell
    val cellOf = out.map(r => r._1 -> r._2).toMap
    (0 until 3).foreach { b =>
      val cells = (0 until 30).filter(_ % 3 == b).map(i => cellOf(i.toLong))
      assert(cells.distinct.size == 1, s"blob $b split across cells $cells")
    }
  }

  test("ANN LSH hits are a subset of corpus with correct shape; recall>0 vs brute force") {
    val brute = Similarity.annBruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.annLshTopK(spark, sf).collect()
    assert(lsh.nonEmpty, "LSH returned no candidates at all")
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(2))).toSet
    // every LSH hit is a real vector pair; some overlap with exact top-5
    val recall = (brute intersect lshPairs).size.toDouble / brute.size
    assert(recall > 0.0, s"zero recall: lsh=${lshPairs.size} brute=${brute.size}")
  }

  test("ANN recovers planted nearest neighbors (brute force exactly, LSH mostly)") {
    import org.apache.spark.sql.DataFrame
    val corpus = Tables(spark, sf).embeddings.select(col("vec_id"), col("embedding"))
    // queries = 10 corpus vectors, slightly perturbed (cosine ≈ 0.9999
    // with their source) under shifted ids
    val queries: DataFrame = corpus.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") * lit(1.001) + lit(0.0005)).cast("float"))
          .as("embedding"))
    def top1(df: DataFrame): Map[Long, Long] =
      df.filter(col("rnk") === 1).collect()
        .map(r => (r.getLong(0) - 100000L) -> r.getLong(2)).toMap
    val brute = top1(operators.Similarity.annBruteForceTopKFrom(corpus, queries))
    assert((0L until 10L).forall(q => brute(q) == q),
      s"brute force must recover every planted neighbor: $brute")
    val lsh = top1(operators.Similarity.annLshTopKFrom(corpus, queries))
    val recovered = (0L until 10L).count(q => lsh.get(q).contains(q))
    assert(recovered >= 8,
      s"LSH recovered only $recovered/10 planted neighbors: $lsh")
  }

  test("IVF ANN recovers planted neighbors; probes a strict corpus subset") {
    import org.apache.spark.sql.DataFrame
    val corpus = Tables(spark, sf).embeddings.select(col("vec_id"), col("embedding"))
    val queries: DataFrame = corpus.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") * lit(1.001) + lit(0.0005)).cast("float"))
          .as("embedding"))
    // a planted copy keeps its source's direction, hence its source's
    // argmax cell — and the query's best probe IS that cell, so IVF must
    // recover every planted neighbor
    val ivf = operators.Similarity.annIvfTopKFrom(corpus, queries)
      .filter(col("rnk") === 1).collect()
      .map(r => (r.getLong(0) - 100000L) -> r.getLong(2)).toMap
    val recovered = (0L until 10L).count(q => ivf.get(q).contains(q))
    assert(recovered >= 9, s"IVF recovered only $recovered/10 planted: $ivf")
    // on the raw fixture, IVF's top-5 agrees with brute force on most
    // queries' top-1 (nprobe=4 of k=16 cells — recall, not exactness)
    val brute = operators.Similarity.annBruteForceTopK(spark, sf)
      .filter(col("rnk") === 1).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ivfRaw = operators.Similarity.annIvfTopK(spark, sf)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val agree = brute.count { case (q, n1) => ivfRaw.get(q).exists(_.contains(n1)) }
    assert(agree >= 5, s"IVF top-5 contains brute top-1 for only $agree/10 queries")
  }

  test("IVF ANN excludes zero-norm vectors instead of corrupting results") {
    // a zero vector has no cosine direction: unguarded, its NaN cell
    // scores null out array_position (corpus row vanishes silently) and
    // NaN-sort-first picks bogus probe cells on the query side
    val corpus = Tables(spark, sf).embeddings.select(col("vec_id"), col("embedding"))
    val queries = corpus.filter(col("vec_id") < 10)
    val zero = spark.range(1).select(lit(900000L).as("vec_id"),
      array_repeat(lit(0.0f), 64).as("embedding"))
    val base = operators.Similarity.annIvfTopKFrom(corpus, queries)
      .collect().map(_.toSeq).toSeq
    val guarded = operators.Similarity
      .annIvfTopKFrom(corpus.union(zero), queries.union(zero))
      .collect()
    // the zero vector appears as neither query nor neighbor, and every
    // other result is untouched (id 900000 > the 16 centroid-source ids,
    // so the quantizer is identical)
    assert(guarded.forall(r => r.getLong(0) != 900000L && r.getLong(2) != 900000L))
    assert(guarded.map(_.toSeq).toSeq == base)
  }

  test("embedding near-dup funnel recovers planted duplicates, stays sub-quadratic") {
    val corpus = Tables(spark, sf).embeddings.select(col("vec_id"), col("embedding"))
    val n = corpus.count()
    // plant 20 near-duplicates: perturbed copies under shifted ids
    // (cosine ≈ 0.9999 with their source, so they must verify at τ=0.9)
    val planted = corpus.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") * lit(1.001) + lit(0.0005)).cast("float"))
          .as("embedding"))
    val r = operators.Similarity
      .embeddingNearDupSummaryFrom(corpus.union(planted), 0.9).head()
    val (nVecs, nCand, nDups) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nVecs == n + 20)
    assert(nDups >= 20L, s"only $nDups dup pairs found of >= 20 planted")
    val allPairs = nVecs * (nVecs - 1) / 2
    assert(nCand < allPairs / 10,
      s"candidate funnel is not sub-quadratic: $nCand of $allPairs pairs")
    // the raw fixture has no accidental near-dups at this threshold
    val raw = operators.Similarity.embeddingNearDupSummaryFrom(corpus, 0.9).head()
    assert(raw.getLong(2) == 0L, s"unexpected raw near-dups: $raw")
  }

  test("winnow fingerprints: shared-substring guarantee, Scala-model equality, short-text edge") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog" // 43 chars > 23
    val docs = Seq(
      (1L, s"aaa bbb ccc $shared ddd eee"),
      (2L, s"zzz yyy $shared xxx uuu www"),
      (3L, "qqq rrr sss ttt qqq rrr sss ttt qqq rrr sss ttt qqq rrr"),
      (4L, "shorter than 23")).toDF("doc_id", "text")
    val byDoc = Dedup.winnowFingerprintSetsFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // MOSS guarantee: any shared substring of >= w+k-1 = 23 chars forces a
    // shared fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "planted shared substring missed")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty,
      "unrelated docs share fingerprints")
    assert(byDoc(4L).isEmpty, "sub-23-char text must yield no fingerprints")
    // bit-exact Scala model on one doc
    val text = s"aaa bbb ccc $shared ddd eee".toLowerCase
    val hs = text.sliding(16).map(
      _.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)).toVector
    val model = hs.sliding(8).map(_.min).toSet
    assert(byDoc(1L) == model, s"engine=${byDoc(1L)} model=$model")
    // the codegen expression ≡ the built-in HOF formulation, doc by doc
    val hof = Dedup.winnowFingerprintSetsHofFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(hof == byDoc, "winnow_fps codegen != HOF reference formulation")
  }

  test("decode features: the PPM codec parses framed images bit-exactly") {
    val feats = Multimodal.decodeFeatures(spark, sf)
      .filter(col("doc_id") === 0L).head()
    val text = Tables(spark, sf).documents
      .filter(col("doc_id") === 0L).head().getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    val h = bytes.length / 24
    val raster = bytes.take(h * 24).map(_ & 0xff)
    assert(feats.getLong(1) == 8L && feats.getLong(2) == h.toLong)
    assert(feats.getLong(3) == 255L)
    def chanMean(off: Int): Double = {
      val c = raster.zipWithIndex.collect { case (b, i) if i % 3 == off => b }
      c.sum.toDouble / c.length
    }
    assert(math.abs(feats.getDouble(4) - chanMean(0)) < 1e-3)
    assert(math.abs(feats.getDouble(5) - chanMean(1)) < 1e-3)
    assert(math.abs(feats.getDouble(6) - chanMean(2)) < 1e-3)
  }

  test("PPM codec: real-world headers parse; corrupt payloads fall back") {
    import Multimodal.PpmDecoder
    // a hand-built 2x2 image with comments and multi-digit dims territory
    val hdr = "P6\n# a comment line\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array[Byte](
      10, 20, 30,  40, 50, 60,
      70, 80, 90, 100, 110, 120)
    val img = PpmDecoder.decode(7L, hdr ++ raster)
    assert(img.isDefined)
    val f = img.get
    assert(f.width == 2 && f.height == 2 && f.maxval == 255)
    assert(f.r_mean == (10 + 40 + 70 + 100) / 4.0)
    assert(f.g_mean == (20 + 50 + 80 + 110) / 4.0)
    assert(f.b_mean == (30 + 60 + 90 + 120) / 4.0)
    // fallback: wrong magic, zero pixels, truncated raster
    assert(PpmDecoder.decode(1L, "P5\n2 2\n255\n".getBytes ++ raster).isEmpty)
    assert(PpmDecoder.decode(1L, "P6\n8 0\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(PpmDecoder.decode(1L, hdr ++ raster.take(11)).isEmpty)
    assert(PpmDecoder.decode(1L, Array.emptyByteArray).isEmpty)
  }

  test("minhash summary scans the corpus exactly once (plan-level signal)") {
    // Direct signal instead of a job tally (job counts shift with AQE
    // staging and listener timing): across EVERY query execution the
    // funnel triggers, the documents parquet must appear in NO executed
    // plan directly — the corpus is only read inside the one cached
    // signature materialization (whose parquet scan lives in the
    // InMemoryRelation's cached plan, not the query plan). The
    // pre-round-3 regression — a cosmetic `docs.count()` rescan — would
    // surface as a direct FileSourceScan here. The companion signal
    // (≥ 1 InMemoryTableScan) proves the cache path is actually in play.
    import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.util.QueryExecutionListener
    def docScans(p: SparkPlan): Int = {
      val self = p match {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("documents")) => 1
        case _ => 0
      }
      // descend through the AQE wrappers (both are leaves to collect())
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      self + kids.map(docScans).sum + p.subqueries.map(docScans).sum
    }
    def cacheScans(p: SparkPlan): Int = {
      val self = p match { case _: InMemoryTableScanExec => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      self + kids.map(cacheScans).sum
    }
    val direct = new java.util.concurrent.atomic.AtomicInteger(0)
    val cached = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        direct.addAndGet(docScans(qe.executedPlan))
        cached.addAndGet(cacheScans(qe.executedPlan))
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = Tables(spark, sf).documents.select(col("doc_id"), col("text"))
      Dedup.minhashLshSummaryFrom(docs).collect()
      org.apache.spark.sql.graft.bridge.waitListenerBus(spark)
      assert(direct.get() == 0,
        s"funnel re-scanned the corpus parquet ${direct.get()} times directly")
      assert(cached.get() >= 1, "no InMemoryTableScan — signature cache not in play")
    } finally spark.listenerManager.unregister(listener)
  }

  test("iterative fixpoints are run-to-run deterministic (pagerank, LPA)") {
    // the design claim behind their SQL oracles: integer arithmetic +
    // fixed tie-breaks make the iteration independent of partitioning and
    // scheduling — two runs must produce byte-identical sequences
    def runPr() = GraphOps.pageRank(spark, sf).collect().toSeq
    def runLp() = GraphOps.labelPropagation(spark, sf).collect().toSeq
    assert(runPr() == runPr())
    assert(runLp() == runLp())
  }

  test("pagerank: fixed-point agrees with GraphX's double implementation") {
    // cross-validation against an INDEPENDENT PageRank: same recurrence
    // (0.15 + 0.85·Σ rank/outdeg, 10 iterations, no dangling
    // redistribution), different arithmetic. Integer truncation error is
    // bounded by Σ 0.85^i·(in-degree micro-units) ≪ 0.01.
    import org.apache.spark.graphx.{Edge, Graph}
    import org.apache.spark.storage.StorageLevel
    val edges = GraphOps.directedEdges(Tables(spark, sf))
    val edgeRdd = spark.sparkContext.parallelize(
      edges.collect().map(r => Edge(r.getLong(0), r.getLong(1), 1L)).toSeq)
    val g = Graph.fromEdges(edgeRdd, 0L,
      StorageLevel.MEMORY_ONLY, StorageLevel.MEMORY_ONLY)
    val gx = g.staticPageRank(10).vertices.collect().toMap
    val fp = GraphOps.pageRank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1) / 1e6).toMap
    assert(fp.keySet == gx.keySet.map(_.toLong))
    val maxDiff = fp.map { case (n, v) => math.abs(v - gx(n)) }.max
    assert(maxDiff < 0.01, s"fixed-point diverges from GraphX: max |diff| = $maxDiff")
  }

  test("pagerank: ranks positive, micro-rank sum ≈ node count") {
    val pr = GraphOps.pageRank(spark, sf).collect()
    assert(pr.forall(_.getLong(1) >= 150000L)) // base rank is the floor
    val sum = pr.map(_.getLong(1)).sum.toDouble / 1e6
    assert(math.abs(sum - pr.length) / pr.length < 0.2,
      s"rank sum $sum vs n=${pr.length}")
  }

  test("label propagation: labels are real node ids, one per node") {
    val lp = GraphOps.labelPropagation(spark, sf).collect()
    val nodes = lp.map(_.getLong(0)).toSet
    assert(lp.map(_.getLong(1)).forall(nodes.contains))
    assert(nodes.size == lp.length)
  }

  test("modularity communities: two triangles split at the bridge; swap cycles broken") {
    import spark.implicits._
    // the classic two-triangle barbell: 1-2-3 and 4-5-6 joined by the
    // bridge 3-4. Fully synchronous gain-greedy updates oscillate here
    // (1↔2 and 5↔6 swap forever — hand-derivable from round 1's
    // symmetric gains); the node-parity schedule breaks the cycles, and
    // by round 4 the iteration converges to exactly the two triangles.
    // Labels below are the hand-derived fixpoint under the documented
    // (gain DESC, stay-first, c ASC) rule: {1,2,3}→2, {4,5,6}→6.
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val ue = tri.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = GraphOps.modularityCommunitiesFrom(ue).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
      4L -> 6L, 5L -> 6L, 6L -> 6L), s"barbell communities: $got")
    // fixture sanity: every node labeled with a real node id; the
    // greedy phase must actually coarsen (strictly fewer communities
    // than nodes) — singletons staying singleton forever would mean
    // the gain rule never fires
    val fx = GraphOps.modularityCommunities(spark, sf).collect()
    val nodes = fx.map(_.getLong(0)).toSet
    assert(fx.map(_.getLong(1)).forall(nodes.contains))
    assert(fx.map(_.getLong(1)).toSet.size < nodes.size)
  }

  test("louvain two-level: barbell unmerged, triangle ring merges (resolution limit)") {
    import spark.implicits._
    def sym(pairs: Seq[(Long, Long)]) =
      pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .toDF("src", "dst")
    // barbell: the two triangles are well-separated — the contracted
    // super-graph's bridge gain is negative (2m·1 − 7·7 < 0), so the
    // second level is the IDENTITY on phase 1's communities
    val barbell = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L),
      (4L, 6L), (5L, 6L), (3L, 4L)))
    val b = GraphOps.louvainTwoLevelFrom(barbell).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(b.forall { case (_, l1, l2) => l1 == l2 },
      s"barbell phase 2 must be the identity: ${b.toSeq}")
    assert(b.map(_._3).toSet.size == 2)
    // ring of 10 triangles bridged by single edges — the classic
    // resolution-limit case (Fortunato & Barthélemy): merging two
    // adjacent triangles gains e_AB/m − 2·(tot_A·tot_B)/(2m)² =
    // 1/40 − 2·64/6400 > 0, which node-granular moves can never
    // realize (no single node move helps) but the contracted phase
    // does. Phase 1 must find the 10 triangles; phase 2 must merge
    // some adjacent pairs (strictly fewer final communities).
    val ring = sym((0 until 10).flatMap { t =>
      val Seq(a, b2, c) = Seq(0, 1, 2).map(i => t * 3L + i)
      Seq((a, b2), (a, c), (b2, c),
        (c, ((t + 1) % 10) * 3L)) // bridge to next triangle's 'a'
    })
    val r = GraphOps.louvainTwoLevelFrom(ring).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val l1Comms = r.map(_._2).toSet
    val l2Comms = r.map(_._3).toSet
    assert(l1Comms.size == 10,
      s"phase 1 must find the 10 triangles: ${l1Comms.size}")
    // phase 1 communities == the triangles themselves
    assert(r.groupBy(_._2).values.forall(g =>
      g.map(_._1 / 3).toSet.size == 1 && g.size == 3))
    assert(l2Comms.size < 10 && l2Comms.size >= 5,
      s"phase 2 must merge adjacent triangles: ${l2Comms.size}")
    // coarsening validity: each phase-1 community maps to exactly one
    // final community
    assert(r.groupBy(_._2).values.forall(_.map(_._3).toSet.size == 1))
  }

  test("louvain gain survives past-Long-overflow edge mass (Decimal(38,0) envelope)") {
    import spark.implicits._
    // the barbell again, but every edge carries w = 10^15: the gain's
    // first product m2·kic = 1.4e16 · 1e15 ≈ 1.4e31 is ~1.5e12× past
    // Long.MaxValue on round 1 — a Long gain would overflow-fail under
    // ANSI (and silently corrupt the argmax without it). The
    // Decimal(38,0) gain is exact there, and scaling every weight by a
    // constant scales every gain by w² without reordering any argmax,
    // so the communities must equal the unit-weight fixpoint.
    val w = 1000000000000000L // 1e15
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val ew = tri.flatMap { case (a, b) => Seq((a, b, w), (b, a, w)) }
      .toDF("src", "dst", "w")
    val got = GraphOps.louvainMovePhase(ew, GraphOps.LouvainRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
      4L -> 6L, 5L -> 6L, 6L -> 6L), s"heavy-weight barbell: $got")
  }

  test("routing: sssp-with-paths costs match oracle-checked SSSP; paths are valid") {
    val costs = GraphOps.sssp(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val routed = GraphOps.ssspPaths(spark, sf).collect()
    assert(routed.map(_.getLong(0)).toSet == costs.keySet)
    val edges = GraphOps.undirectedEdges(Tables(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def w(s: Long, d: Long) = (s * 31L + d) % 7L + 1L
    routed.foreach { r =>
      val (node, cost, path) = (r.getLong(0), r.getLong(1), r.getString(2))
      assert(cost == costs(node), s"node $node: path cost $cost != sssp ${costs(node)}")
      val hops = path.split("->").map(_.toLong)
      assert(hops.head == 1L && hops.last == node)
      val pairCosts = hops.sliding(2).collect { case Array(a, b) =>
        assert(edges.contains((a, b)), s"edge $a->$b not in graph")
        w(a, b)
      }.sum
      assert(pairCosts == cost, s"node $node: telescoped $pairCosts != $cost")
    }
  }

  test("batched routing with paths: costs == cost-only sweep; paths telescope") {
    // q127 must agree with the oracle-checked cost-only batch (q124's
    // engine) on every (origin, node) cost, its origin-1 slice must be
    // exactly q91, and every returned route must be a real min-cost walk.
    val batched = GraphOps.multiSourcePaths(spark, sf).collect()
    val costs = GraphOps
      .multiSourceCosts(spark, sf, Seq(1L, 2L, 3L, 4L, 5L), 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(batched.map(r => (r.getLong(0), r.getLong(1))).toSet == costs.keySet)
    val edges = GraphOps.undirectedEdges(Tables(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def w(s: Long, d: Long) = (s * 31L + d) % 7L + 1L
    batched.foreach { r =>
      val (o, n, cost, path) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(cost == costs((o, n)))
      val hops = path.split("->").map(_.toLong)
      assert(hops.head == o && hops.last == n)
      val telescoped = hops.sliding(2).collect { case Array(a, b) =>
        assert(edges.contains((a, b)), s"edge $a->$b not in graph")
        w(a, b)
      }.sum
      assert(telescoped == cost, s"($o,$n): telescoped $telescoped != $cost")
    }
    val slice1 = batched.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq.sorted
    val single = GraphOps.ssspPaths(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
    assert(slice1 == single, "origin-1 slice diverges from single-source q91")
  }

  test("multi-source BFS batch: per-origin slice equals single-source BFS") {
    // One k-source sweep must give, for every origin, exactly the hop
    // distances a dedicated single-source BFS (the oracle-checked q32
    // shape) computes — batching is a throughput optimization, never a
    // semantics change. k=12 keeps the spec fast; q126 runs the full
    // k=100 against the DuckDB recursive-CTE oracle.
    val k = 12
    val batched = GraphOps.multiSourceBfs(spark, sf, k = k).collect()
      .groupBy(_.getLong(0))
      .map { case (o, rows) =>
        o -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    // source set: the arithmetic rule, deduplicated (|distinct| ≤ k)
    val m = Tables(spark, sf).customer
      .agg(max(col("c_custkey"))).head().getLong(0)
    val expectSrcs = (0 until k).map(i => 1L + (i.toLong * 37L) % m).distinct
    assert(batched.keySet == expectSrcs.toSet,
      s"origins ${batched.keySet} != rule-derived $expectSrcs")
    // three representative origins replayed single-source. An isolated
    // source (a custkey with no incident edges) is {s -> 0} in the batch
    // (and in the q126 oracle), but Graph.fromEdges drops edgeless
    // vertices so single-source bfs returns empty — compare accordingly
    // instead of depending on the fixture never producing one.
    val edgeNodes = GraphOps.undirectedEdges(Tables(spark, sf))
      .select(col("src")).distinct().collect().map(_.getLong(0)).toSet
    expectSrcs.take(3).foreach { s =>
      if (edgeNodes.contains(s)) {
        val single = GraphOps.bfs(spark, sf, source = s).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(batched(s) == single,
          s"origin $s: batched slice diverges from single-source BFS")
      } else assert(batched(s) == Map(s -> 0L),
        s"isolated origin $s: expected only the seed row")
    }
  }

  test("flat quantizer: broadcast-relation assignment ≡ literal inlining") {
    // The scale path for K × Dim beyond literal-tree budget must be
    // bit-compatible with the inlined path: same DotProduct scores, same
    // first-max tie-break. Compared cell-for-cell on the fixture corpus.
    val vecs = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.centroidDirs(vecs, 16)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell").cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lit = cells(Similarity.assignCellsFlat(vecs, cents))
    val bc = cells(Similarity.assignCellsFlatBcast(vecs, cents))
    assert(lit.nonEmpty && lit == bc,
      s"assignment diverged on ${lit.count { case (k, v) => bc.get(k) != Some(v) }} vectors")
  }

  test("quantized (k-means/PQ) dispatch: broadcast branch ≡ literal branch") {
    // the fixed-point sibling of the flat-quantizer dispatch test above:
    // same integer distance fold, same lowest-cell/lowest-j tie-break,
    // compared bit-for-bit on the fixture corpus
    val eq = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1e6)).cast("long")).as("e"))
    // k-means assignment: 12 centroids seeded from the lowest-id vectors
    val cents = eq.orderBy(col("vec_id")).limit(12)
      .collect().map(_.getSeq[Long](1).toArray)
    def asg(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell"), col("dist_q")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val la = asg(Similarity.assignQuantizedCellsLit(eq, cents))
    val ba = asg(Similarity.assignQuantizedCellsBcast(eq, cents))
    assert(la.nonEmpty && la == ba)
    // PQ encode: codebook from the 16 lowest-id vectors (the q148 rule)
    val seeds = eq.orderBy(col("vec_id")).limit(16)
      .collect().map(_.getSeq[Long](1).toArray)
    val cb = Array.tabulate(4)(m => seeds.map(_.slice(m * 16, (m + 1) * 16)))
    val (cl, ql) = Similarity.pqEncodeLit(eq, cb, queryMod = 50L)
    val (cbc, qbc) = Similarity.pqEncodeBcast(eq, cb, queryMod = 50L)
    val codesL = cl.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val codesB = cbc.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codesL.nonEmpty && codesL == codesB)
    val lutL = ql.collect()
      .map(r => r.getLong(0) -> r.getSeq[Seq[Long]](1)).toMap
    val lutB = qbc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Seq[Long]](1)).toMap
    assert(lutL.nonEmpty && lutL == lutB)
  }

  test("semantic keep-list: group semantics vs q128's per-pair rule on a chain") {
    import spark.implicits._
    // Constructed chain in one cell (k=1 → single centroid): ids 1 ⊥ 2,
    // but both are tau-similar to 3 (cos 1·3 = cos 2·3 ≈ 0.707 ≥ 0.35;
    // cos 1·2 = 0 < 0.35). The per-pair rule KEEPS 2 (its only tau-mate
    // has a higher id); group semantics collapse the whole component to
    // the minimum — the documented divergence, asserted both ways.
    val dim = 8
    def v(hot: Seq[(Int, Float)]): Array[Float] = {
      val a = Array.fill(dim)(0.0f); hot.foreach { case (i, x) => a(i) = x }; a
    }
    val vecs = Seq(
      (1L, v(Seq(0 -> 1.0f))),
      (2L, v(Seq(1 -> 1.0f))),
      (3L, v(Seq(0 -> 1.0f, 1 -> 1.0f)))).toDF("vec_id", "embedding")
    val pairRule = Similarity.semanticDedupFrom(vecs, 0.35, k = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(pairRule == Map(1L -> true, 2L -> true, 3L -> false),
      s"per-pair rule: expected keep {1,2}, got $pairRule")
    val group = Similarity.semanticKeepListFrom(vecs, 0.35, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(group == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"group semantics: expected one component with canonical 1, got $group")
  }

  test("closeness centrality: hand-checked tiny graph + isolated source = 0.0") {
    import spark.implicits._
    // undirected path 1 -2- 2 -3- 3 (weights 2, 3), node 99 isolated
    val edges = Seq((1L, 2L, 2L), (2L, 1L, 2L), (2L, 3L, 3L), (3L, 2L, 3L))
      .toDF("src", "dst", "w")
    val rows = GraphOps.closenessFrom(spark, edges, Seq(1L, 99L), maxHops = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // origin 1 reaches {1:0, 2:2, 3:5} → reached=3, sum=7, c=(3-1)/7
    assert(rows(1L) == ((3L, 7L, 2.0 / 7.0)))
    // isolated source: only the seed row, closeness 0.0 by convention
    assert(rows(99L) == ((1L, 0L, 0.0)))
  }

  test("closeness centrality: q134 registered result matches per-origin recompute") {
    val df = GraphOps.closenessCentrality(spark, sf, k = 4)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (reached, sum, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val expect = if (sum == 0L) 0.0 else (reached - 1).toDouble / sum.toDouble
      assert(c == expect, s"origin ${r.getLong(0)}: closeness formula mismatch")
    }
  }

  test("maxCust is memoized per fixture dir — graph queries reuse the constant") {
    // Deterministic proof of no re-derivation (no job counting, no
    // sleeps): poison the cached constant and observe that the next edge
    // derivation embeds the poisoned literal instead of rescanning.
    GraphOps.maxCustCache.clear()
    GraphOps.directedEdges(graft.Tables(spark, sf))
    assert(GraphOps.maxCustCache.contains(sf))
    val real = GraphOps.maxCustCache(sf)
    try {
      GraphOps.maxCustCache(sf) = real + 9999L
      val plan = GraphOps.directedEdges(graft.Tables(spark, sf))
        .queryExecution.analyzed.toString
      assert(plan.contains((real + 9999L).toString), plan)
    } finally GraphOps.maxCustCache(sf) = real
  }

  test("routing sweep durable checkpoint: reliable snapshots, identical costs") {
    import java.nio.file.Files
    val ckptDir = Files.createTempDirectory("graft_ckpt_route")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val edges = GraphOps.symmetrizedEdges(graft.Tables(spark, sf))
      .select(col("src"), col("dst"),
        ((col("src") * 31 + col("dst")) % 7 + 1).as("w"))
    val durable = GraphOps
      .multiSourceCostsFrom(spark, edges, Seq(1L, 2L), 4, durableEvery = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val written = Files.walk(ckptDir).filter(Files.isRegularFile(_)).count()
    assert(written > 0, s"no reliable checkpoint files under $ckptDir")
    val local = GraphOps
      .multiSourceCostsFrom(spark, edges, Seq(1L, 2L), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(durable == local)
  }

  test("pagerank durable checkpoint: reliable snapshots on disk, lineage cut, same fixpoint") {
    // The reference's checkpoint() flushes all dirty pages to durable
    // storage (buffer_pool.cpp:363-377); the Spark analogue is a reliable
    // RDD checkpoint every N rounds so an executor loss replays at most
    // N-1 rounds. Values must be bit-identical to the local-only mode.
    import java.nio.file.{Files, Paths}
    val ckptDir = Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val de = GraphOps.directedEdges(graft.Tables(spark, sf))
    val durable = GraphOps.pageRankFrom(spark, de, iterations = 4, durableEvery = 2)
    val durableRows = durable.collect().toSeq
    // checkpoint files actually exist on (what stands in for) durable storage
    val written = Files.walk(ckptDir).filter(Files.isRegularFile(_)).count()
    assert(written > 0, s"no reliable checkpoint files under $ckptDir")
    // lineage is truncated: the returned plan reads the checkpointed RDD,
    // not the 4-round join tree
    val plan = durable.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"), plan)
    val localRows = GraphOps.pageRankFrom(spark, de, iterations = 4).collect().toSeq
    assert(durableRows == localRows)
  }

  test("p2p routing: batched multi-source costs equal single-source SSSP") {
    val p2p = operators.GraphOps.p2pRouting(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sssp = operators.GraphOps.sssp(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dsts = Seq(10L, 20L, 30L, 40L, 50L)
    dsts.foreach { d =>
      assert(p2p.get((1L, d)) == sssp.get(d),
        s"origin 1 -> $d: batched=${p2p.get((1L, d))} sssp=${sssp.get(d)}")
    }
  }

  test("landmark index: triangle-inequality upper bound holds at true distances") {
    // hop-capping can locally break the triangle inequality (a via-landmark
    // path may need more hops than the cap); at a horizon beyond the
    // fixture graph's diameter the capped costs ARE the true distances,
    // where the ALT bound must hold for every reachable pair
    val rows = operators.GraphOps.landmarkBounds(spark, sf, maxHops = 16).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(r.getLong(3) >= r.getLong(2),
          s"${r.getLong(0)}->${r.getLong(1)}: upper ${r.getLong(3)} < exact ${r.getLong(2)}")
    }
  }

  test("connected components: same component implies BFS-reachable (spot)") {
    val cc = GraphOps.connectedComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val bfs = GraphOps.bfs(spark, sf).collect().map(_.getLong(0)).toSet
    // node 1's component members reached within 10 hops must share 1's label
    bfs.foreach(n => assert(cc(n) == cc(1L), s"node $n reached from 1 but in ${cc(n)}"))
  }

  test("domain mixture: per-source quota respected, greedy prefix, exact budgets") {
    val rows = operators.CorpusOps.domainMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(4)).sum // n_tokens over all docs
    val srcs = rows.map(_.getString(1)).distinct.sorted
    val sumW = (1L to srcs.length).sum
    rows.groupBy(_.getString(1)).foreach { case (s, rs) =>
      val weight = srcs.indexOf(s) + 1L
      val budget = weight * total / (2 * sumW)
      assert(rs.forall(_.getLong(2) == weight), s"$s weight")
      assert(rs.forall(_.getLong(6) == budget), s"$s budget")
      // cum_tokens telescopes in (quality DESC, doc_id) order and the
      // selection is exactly the prefix that fits the quota
      val ordered = rs.sortBy(r => (-r.getLong(3), r.getLong(0)))
      var cum = 0L
      ordered.foreach { r =>
        cum += r.getLong(4)
        assert(r.getLong(5) == cum, s"$s cum at doc ${r.getLong(0)}")
        assert(r.getBoolean(7) == (cum <= budget), s"$s selected flag")
      }
      // selected token mass never exceeds the quota
      val spent = rs.filter(_.getBoolean(7)).map(_.getLong(4)).sum
      assert(spent <= budget, s"$s overspent $spent > $budget")
    }
  }

  test("contamination score: consistent with the q117 gate, pm exact") {
    val score = TextAnalysis.contaminationScore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    score.values.foreach { case (grams, shared, pm) =>
      assert(grams >= 1 && shared >= 0 && shared <= grams)
      assert(pm == 1000 * shared / math.max(grams, 1))
    }
    // the binary gate's rows are exactly the docs scoring > 0, with the
    // same overlap counts
    val gate = TextAnalysis.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val positive = score.collect { case (id, (_, s, _)) if s > 0 => id -> s }
    assert(positive == gate)
  }

  test("clustering coefficient: hand-checked triangle+pendant, corner sum = 3×q34") {
    import spark.implicits._
    // triangle 1-2-3 with pendant 4 on node 1
    val ue = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L),
      (1L, 4L), (4L, 1L)).toDF("src", "dst")
    val cc = GraphOps.clusteringCoefficientFrom(ue).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(cc(1L) == ((3L, 1L, 2000 * 1 / (3 * 2))))   // deg 3, 1 tri → 333
    assert(cc(2L) == ((2L, 1L, 1000L)))                 // deg 2, 1 tri → 1000
    assert(cc(3L) == ((2L, 1L, 1000L)))
    assert(cc(4L) == ((1L, 0L, 0L)))                    // pendant
    // fixture: per-node triangle corners sum to 3× the global count
    val perNode = GraphOps.clusteringCoefficient(spark, sf).collect()
    val nTri = GraphOps.triangleCount(spark, sf).head().getLong(0)
    assert(perNode.map(_.getLong(2)).sum == 3 * nTri)
  }

  test("event funnel: strict ordering, pre-view clicks ignored, partial funnels null") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 11:00:00")),
      (1L, "purchase", t("2024-01-01 12:00:00")),
      // user 2: click BEFORE first view — must not count; no later click
      (2L, "click", t("2024-01-02 09:00:00")),
      (2L, "view", t("2024-01-02 10:00:00")),
      (2L, "purchase", t("2024-01-02 11:00:00")),
      // user 3: view only
      (3L, "view", t("2024-01-03 10:00:00")),
      // user 1 noise: later view must not displace the first
      (1L, "view", t("2024-01-05 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = operators.Behavioral.eventFunnelFrom(ev).collect()
      .map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)))).toMap
    assert(got(1L) == ((Some(t("2024-01-01 10:00:00")),
      Some(t("2024-01-01 11:00:00")), Some(t("2024-01-01 12:00:00")))))
    assert(got(2L) == ((Some(t("2024-01-02 10:00:00")), None, None)),
      "pre-view click must not advance the funnel")
    assert(got(3L) == ((Some(t("2024-01-03 10:00:00")), None, None)))
  }

  test("cohort retention: Monday cohorts, exact week offsets, distinct users") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // 2024-01-01 is a Monday. u1 cohort week 1, active weeks 1 and 3;
    // u2 cohort week 2, active week 2 (twice — must count once).
    val ev = Seq(
      (1L, t("2024-01-02 10:00:00")), (1L, t("2024-01-17 10:00:00")),
      (2L, t("2024-01-10 10:00:00")), (2L, t("2024-01-11 10:00:00"))
    ).toDF("user_id", "ts")
    val got = operators.Behavioral.cohortRetentionFrom(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L))
  }

  test("corpus diff: statuses follow the snapshot rules for every doc") {
    val rows = operators.CorpusOps.corpusDiff(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, status) = (r.getLong(0), r.getString(1))
      val expected =
        if (id % 5 == 4) "added"          // absent from A, present in B
        else if (id % 5 == 0) "removed"   // present in A, absent from B
        else if (id % 7 == 0) "changed"   // in both, B revised
        else "same"
      assert(status == expected, s"doc $id: $status != $expected")
      // digests null exactly when the side is absent
      assert(r.isNullAt(2) == (status == "added"))
      assert(r.isNullAt(3) == (status == "removed"))
    }
  }

  test("degree assortativity: path graph scores exactly -1; moments exact") {
    import spark.implicits._
    val ue = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r = GraphOps.degreeAssortativityFrom(ue).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 6 && r.getLong(2) == 6)
    assert(r.getLong(3) == 10 && r.getLong(4) == 10 && r.getLong(5) == 8)
    assert(r.getDouble(6) == -1.0) // leaves attach to the hub only
  }

  test("k-core peel: cascading chain removal, triangle survives") {
    import spark.implicits._
    // triangle 1-2-3 plus chain 3-4-5: round 1 drops 5, round 2 drops 4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val ue = (e ++ e.map(_.swap)).toDF("src", "dst")
    val core = GraphOps.kCoreFrom(ue, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k-core fixpoint: a 10-round cascading chain converges past any fixed bound") {
    import spark.implicits._
    // triangle 1-2-3 with a 10-node chain hanging off node 3: the chain
    // peels ONE node per round from its free end (every interior node
    // holds degree 2 until its outer neighbor drops), so the peel needs
    // 10 rounds — any fixed 4-round variant stops early
    val chain = (3L to 12L).map(i => (i, i + 1))
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++ chain
    val ue = (e ++ e.map(_.swap)).toDF("src", "dst")
    val bounded = GraphOps.kCoreFrom(ue, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0)).toSet
    assert(bounded.exists(_ > 3L),
      "4 rounds must NOT have finished peeling the 10-node chain")
    val full = GraphOps.kCoreFrom(ue, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"fixpoint peel must leave exactly the triangle: $full")
  }

  test("k=4 truss: strip braces cascade away, the K5 core survives with support 3") {
    import spark.implicits._
    // K5 on {1..5} (every edge in 3 triangles — a 5-truss, so certainly
    // a 4-truss) with a 5-triangle strip hanging off edge (4,5):
    // round 1 drops the strip's support-1 boundary edges, which
    // destroys every strip triangle, so round 2 drops the now-
    // support-0 interior rungs — a genuine multi-round cascade at
    // minSup=2, ending at exactly the K5 with all supports 3.
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val strip = Seq((4L, 6L), (5L, 6L), (5L, 7L), (6L, 7L), (6L, 8L),
      (7L, 8L), (7L, 9L), (8L, 9L), (8L, 10L), (9L, 10L))
    val e = k5 ++ strip
    val ue = (e ++ e.map(_.swap)).toDF("src", "dst")
    val (df, rounds) = GraphOps.kTrussWithRounds(ue, k = 4)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rounds >= 3, s"cascade must need >1 peel round, got $rounds")
    assert(got == k5.map(_ -> 3L).toMap,
      s"k=4 truss must be exactly the K5 with support 3: $got")
  }

  test("peel-oracle unroll depths cover the fixture (exhaustion fails fast, named)") {
    // The q153/q175/q178 oracles unroll a FIXED round count; the
    // operators fail fast when the realized peel depth exceeds it
    // (an exhausted unroll makes the ORACLE wrong, not the operator).
    // This spec pins the current fixture inside the unrolls with ≥1
    // round of slack, so a deeper future fixture trips HERE with the
    // cause named instead of surfacing as a correctness-gate hash
    // mismatch.
    val t = Tables(spark, sf)
    val ue = GraphOps.undirectedEdges(t)
    val core = GraphOps.kCoreWithRounds(ue)._2
    assert(core < GraphOps.KCoreOracleUnroll,
      s"k-core realized $core rounds; unroll ${GraphOps.KCoreOracleUnroll} " +
      "has no slack left — raise KCoreOracleUnroll")
    val truss = GraphOps.kTrussWithRounds(ue)._2
    assert(truss < GraphOps.KTrussOracleUnroll,
      s"k-truss realized $truss rounds; unroll ${GraphOps.KTrussOracleUnroll} " +
      "has no slack left — raise KTrussOracleUnroll")
    val folded = ue
      .select((col("src") % GraphOps.TrussDenseMod).as("src"),
        (col("dst") % GraphOps.TrussDenseMod).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val t4 = GraphOps.kTrussWithRounds(folded, k = 4)._2
    assert(t4 < GraphOps.KTrussOracleUnroll,
      s"k=4 folded truss realized $t4 rounds; unroll " +
      s"${GraphOps.KTrussOracleUnroll} has no slack left")
  }

  test("vocabulary spectrum: constructed counts fill every frequency class exactly") {
    import spark.implicits._
    // term t_k occurs exactly k times for k = 1..12: classes 1..10 get
    // one term each, class 11 collects the 11- and 12-count terms
    // (the fixture's word-salad corpus lands everything in class 11 —
    // this pins the binning rule itself)
    val text = (1 to 12).flatMap(k => Seq.fill(k)(s"t$k")).mkString(" ")
    val got = operators.TextAnalysis.vocabularySpectrumFrom(
        Seq((1L, text)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (1L to 10L).foreach(k =>
      assert(got(k) == ((1L, k)), s"class $k: ${got(k)}"))
    assert(got(11L) == ((2L, 23L)), s"class 11: ${got(11L)}")
  }

  test("HITS: directed star puts all authority on the center, all hubness on spokes") {
    import spark.implicits._
    // spokes 2..6 each point at center 1: auth(1)=1e6 (the only cited
    // node), hub(spokes)=1e6 (they cite the max authority), and the
    // center cites nobody / is cited by nobody else → hub(1)=0; spokes
    // are uncited → auth(spokes)=0. Fixed point from round 1.
    val de = (2L to 6L).map(s => (s, 1L)).toDF("src", "dst")
    val got = GraphOps.hitsFrom(de).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (0L, 1000000L), s"center: ${got(1L)}")
    (2L to 6L).foreach(s =>
      assert(got(s) == (1000000L, 0L), s"spoke $s: ${got(s)}"))
  }

  test("eccentricity sample: rows well-formed, diameter_lb is the sample max") {
    val rows = GraphOps.eccentricitySample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val dia = rows.map(_._2).max
    assert(rows.forall(_._4 == dia), "diameter_lb must ride every row")
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 10), "hop cap bounds ecc")
    assert(rows.forall(_._3 >= 1), "origin itself is always reached")
  }

  test("temperature mixture: sqrt flattening up-weights the tail; quotas bounded") {
    import spark.implicits._
    // 10000-doc giant vs 100-doc tail: raw ratio 100:1, sqrt ratio 10:1
    val docs = ((1L to 10000L).map(i => (i, "big")) ++
      (1L to 100L).map(i => (10000L + i, "small")))
      .toDF("doc_id", "source")
    val m = operators.CorpusOps.temperatureMixtureFrom(docs, budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m("big") == ((10000L, 100L, 909L, 909L)), m("big").toString)
    assert(m("small") == ((100L, 10L, 90L, 90L)), m("small").toString)
    // quotas never exceed the budget in total (floor division)
    assert(m.values.map(_._4).sum <= 1000L)
  }

  test("edit linkage: planted typo pair found, divergent pair rejected, cap binds") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val typo = base.updated(20, 'z').updated(30, 'q') // same 16-char prefix, dist 2
    val far  = base.take(16) + ("x" * 60)              // same block, dist >> 8
    val docs = Seq((1L, base), (2L, typo), (3L, far)).toDF("doc_id", "text")
    val got = operators.Dedup.editLinkageFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L)), got.mkString(","))
    // 70 docs sharing a block: excluded and reported — zero pairs, so
    // the skipped mass arrives as the one sentinel row (null pair cols)
    val degen = (1L to 70L).map(i => (i, base + i)).toDF("doc_id", "text")
    val d = operators.Dedup.editLinkageFrom(degen).collect()
    assert(d.length == 1, "sentinel row must carry the skipped report")
    assert(d(0).isNullAt(0) && d(0).isNullAt(1) && d(0).isNullAt(2))
    assert(d(0).getLong(3) == 1L && d(0).getLong(4) == 70L,
      s"skipped report: ${d(0)}")
  }

  test("degree histogram: hand graph bins exactly by bit length") {
    import spark.implicits._
    // star: center degree 9 (bin 4: 1001b), spokes degree 1 (bin 1)
    val e = (2L to 10L).map(s => (1L, s))
    val ue = (e ++ e.map(_.swap)).toDF("src", "dst")
    // the operator is dir-bound; assert its binning rule — bit length
    // via length(bin(deg)) — against the JVM's own bit arithmetic
    val bins = ue.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .select(length(bin(col("deg"))).cast("long").as("b"), col("deg"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bins.forall { case (b, d) =>
      b == 64 - java.lang.Long.numberOfLeadingZeros(d) })
  }

  test("source vocab overlap: constructed shared/unique vocabularies score exactly") {
    import spark.implicits._
    // srcA and srcB share 3 of their (tiny) vocabularies; srcC disjoint
    val docs = Seq(
      (1L, "a", "apple banana cherry date"),
      (2L, "b", "apple banana cherry elder"),
      (3L, "c", "xylo ygdra zeta")).toDF("doc_id", "source", "text")
    val got = operators.CorpusOps.sourceVocabOverlapFrom(
        docs.select(col("source"), col("text")))
      .collect().map(r =>
        ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // |A|=4, |B|=4, shared=3 → jaccard = 3/5 = 600‰
    assert(got(("a", "b")) == ((3L, 600L)), got.toString)
    assert(!got.contains(("a", "c")) && !got.contains(("b", "c")),
      "disjoint vocabularies must yield no row")
  }

  test("robust outliers: constructed corpus with one wild point flags exactly it") {
    import spark.implicits._
    // values 1..9 (cents 100..900) + one 10000: med=500 (rank 5 of 10),
    // devs {400,300,200,100,0,100,...,400, 999500}; sorted devs
    // 0,100,100,200,200,300,300,400,400,999500 → MAD = dev at rank 5
    // = 200; 3·MAD = 600 → only the wild point (dev 999500) exceeds it
    val ev = ((1L to 9L).map(i => (i, "t", i.toDouble)) :+ (10L, "t", 10000.0))
      .toDF("event_id", "event_type", "value")
    val r = operators.Behavioral.robustOutliersFrom(ev).head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 500L &&
      r.getLong(3) == 200L && r.getLong(4) == 1L,
      r.toString)
  }

  test("image near-dup funnel: pigeonhole-exact vs brute force; caps bind") {
    import spark.implicits._
    // constructed hashes: base all-zeros; neighbors at controlled
    // hamming distances 1..9 (flips spread across DIFFERENT bands — the
    // pigeonhole worst case); funnel must equal brute-force τ∈[1,7]
    val base = "0" * 64
    def flip(s: String, bits: Seq[Int]): String =
      bits.foldLeft(s)((a, b) => a.updated(b, if (a(b) == '0') '1' else '0'))
    val rows = Seq(
      (1L, base),
      (2L, flip(base, Seq(0))),                       // d(1,2)=1
      (3L, flip(base, Seq(8, 16, 24, 32))),           // d(1,3)=4, spread
      (4L, flip(base, (0 until 7).map(_ * 8))),       // d(1,4)=7 — max in
      (5L, flip(base, (0 until 9).map(i => i * 7)))   // d(1,5)=9 — out
    )
    val got = operators.Multimodal.imageNearDupFrom(rows.toDF("doc_id", "phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val want = (for {
      (ia, pa) <- rows; (ib, pb) <- rows if ia < ib
      d = ham(pa, pb) if d >= 1 && d <= 7
    } yield (ia, ib, d.toLong)).toSet
    assert(got == want, s"funnel $got != brute $want")
    assert(got.exists(_._3 == 7L), "the τ=7 boundary pair must be found")
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L), "d=9 must be out")
    // cap binds: 70 copies of one hash make all its bands hot — pair
    // generation refused, mass reported via the sentinel row (the
    // exact-dup tier is q187's job). Bands 1-7 hold 71 members (the
    // flipped doc shares them), band 0 holds the 70 copies: 8 hot bands,
    // 70 + 7*71 = 567 skipped rows.
    val degen = (1L to 70L).map(i => (i, base)) :+ (100L, flip(base, Seq(0)))
    val d2 = operators.Multimodal.imageNearDupFrom(degen.toDF("doc_id", "phash"))
      .collect()
    assert(d2.length == 1, "sentinel row must carry the skipped report")
    assert(d2(0).isNullAt(0) && d2(0).isNullAt(1) && d2(0).isNullAt(2))
    assert(d2(0).getLong(3) == 8L && d2(0).getLong(4) == 567L,
      s"skipped report: ${d2(0)}")
  }

  test("string-phash fallback fails fast on malformed hashes") {
    import spark.implicits._
    // a 63-char (or non-binary) hash would fold into a MISALIGNED
    // packed long — bands and hamming silently diverging from the
    // string semantics — so the fallback must raise, not mis-pack
    val bad = Seq((1L, "0" * 63), (2L, "0" * 64))
    val ex = intercept[Exception] {
      operators.Multimodal.imageNearDupFrom(bad.toDF("doc_id", "phash"))
        .collect()
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("64"), s"unexpected: ${ex.getMessage}")
    val nonBinary = Seq((1L, "0" * 63 + "x"), (2L, "0" * 64))
    intercept[Exception] {
      operators.Multimodal
        .imageNearDupFrom(nonBinary.toDF("doc_id", "phash")).collect()
    }
  }

  test("BM25 prune audit: both serve paths publish the q243 split; stored bound guards the fast path") {
    import graft.operators.TextAnalysis
    val docs = graft.Tables(spark, sf).documents
      .select(col("doc_id"), col("text"))
    def auditRow(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))
    }
    val want = TextAnalysis.bm25PruneReportFrom(docs).collect().head
    // inline path: constructing the serve publishes the audit
    TextAnalysis.bm25TopKFrom(docs)
    val inl = auditRow(TextAnalysis.lastServeAudit.get)
    assert(inl._6 == "inline_rank")
    assert((inl._1, inl._2, inl._3, inl._4, inl._5) ==
      (want.getLong(0), want.getLong(1), want.getLong(2),
        want.getLong(3), want.getLong(4)),
      s"inline audit $inl != q243 report $want")
    // stored-rank path over the annotated store: same split, tagged
    val annotated = TextAnalysis.bm25AnnotatePostings(
      TextAnalysis.bm25Postings(docs))
    TextAnalysis.bm25TopKFromPostings(annotated)
    val st = auditRow(TextAnalysis.lastServeAudit.get)
    assert(st._6 == "stored_rank")
    assert((st._1, st._2, st._3, st._4, st._5) ==
      (inl._1, inl._2, inl._3, inl._4, inl._5),
      s"stored audit $st != inline audit $inl")
    // the bound must survive a PARQUET ROUND TRIP in the field
    // metadata (that is where the serve guard reads it — no job): a
    // store rebuilt from disk carries the same stored bound
    val rt = java.nio.file.Files
      .createTempDirectory("graft_pbound_rt").toString
    annotated.write.mode("overwrite").parquet(rt)
    val reread = spark.read.parquet(rt)
    assert(reread.schema("pbound").metadata
      .getLong(TextAnalysis.PboundMetaKey) ==
      TextAnalysis.Bm25PostingBound.toLong,
      "pbound field metadata must survive the parquet round trip")
    // ... and the serve path over the reread store must launch NO job
    // to read the bound (the r19 per-serve first(pbound) aggregate):
    // guard dispatch happens at plan-build time, driver-side
    assert(TextAnalysis.bm25TopKFromPostings(reread).collect().nonEmpty)
    // the guard validates against the bound the store was ACTUALLY
    // compacted with, not the compile-time constant: an old store
    // ranked only to 64 must refuse a 128-posting serve even though
    // the current constant is 128
    val oldStore = annotated
      .withColumn("pbound", TextAnalysis.pboundCol(64L))
      .filter(col("prk").isNull || col("prk") <= 64)
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopKFromPostings(oldStore,
        postingBound = TextAnalysis.Bm25PostingBound)
    }
    assert(ex.getMessage.contains("compacted"), ex.getMessage)
    // a request WITHIN the old store's bound serves fine
    assert(TextAnalysis.bm25TopKFromPostings(oldStore, postingBound = 64)
      .collect().nonEmpty)
  }

  test("sampled-train IVFADC (q248): quarter-sample training serves full-corpus queries; recall near full-train") {
    import graft.operators.Similarity
    val vecs = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    def meanRecall(df: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      (rows.length.toLong, rows.map(_._2).sum.toDouble / rows.length)
    }
    val (nFull, full) = meanRecall(Similarity.ivfAdcRecallEvalFrom(vecs))
    val (nSamp, samp) = meanRecall(
      Similarity.ivfAdcSampleTrainRecall(spark, sf))
    // same query set (training never thins serving), and the quarter-
    // sample codebook must hold recall within one hit of full-train —
    // the Jégou posture's whole claim (codebook quality needs ~100·K
    // points, not the corpus)
    assert(nSamp == nFull, s"query sets differ: $nSamp vs $nFull")
    assert(samp > 0.0, "sampled-train index must retrieve true neighbors")
    assert(samp >= full - 1.0,
      s"sampled-train recall $samp collapsed vs full-train $full")
  }

  test("video perceptual near-dup (q245): a re-encoded clip defeats q217 but not the aHash funnel") {
    import spark.implicits._
    import graft.operators.Multimodal
    val F = Multimodal.VideoFrameBytes
    // base video: 20 frames, frame f = 64 pixels (3 identical bytes
    // each); pixels k < 16+f are LOW (50), the rest HIGH (100) — a
    // distinct hash per frame, bits well clear of the mean
    def frame(f: Int, shift: Int): String =
      (0 until 64).map { k =>
        val c = (if (k < 16 + f) 50 else 100) + shift
        s"${c.toChar}${c.toChar}${c.toChar}"
      }.mkString
    val base = (0 until 20).map(frame(_, 0)).mkString
    // the "re-encoded" clip: frames 5..14 with EVERY byte + 1 — every
    // md5 changes, every gray moves, no bit crosses its frame's mean
    val clip = (5 until 15).map(frame(_, 1)).mkString
    val docs = Seq((1L, base), (2L, clip)).toDF("doc_id", "text")
    // q217 (exact digests): the codec noise defeats it — no pair
    val exact = Multimodal.videoNearDupFrom(docs).collect()
    assert(exact.forall(_.isNullAt(0)),
      s"exact-digest temporal dedup must miss the re-encoded clip")
    // q245 (perceptual hashes): the clip is CONTAINED in the base —
    // 10 frames -> 8 temporal 3-grams, all present in the base
    val got = Multimodal.videoPerceptualNearDupFrom(docs).collect()
      .filter(!_.isNullAt(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.contains((2L, 1L, 8L, 8L, 1000000L)),
      s"the re-encoded clip must be fully contained: ${got.toSeq}")
    // the per-frame hash IS q187's aHash on the P6-framed frame bytes
    val f0 = frame(3, 0)
    val framed = (s"P6\n8 8\n255\n" + f0).getBytes("ISO-8859-1")
    val viaAHash = Multimodal.PpmDecoder.aHash(0L, framed).get._2
    val viaQuery = Multimodal
      .videoPerceptualNearDupFrom(Seq((9L, f0)).toDF("doc_id", "text"))
    val word = {
      val g = (0 until 64).map(k => if (k < 19) 50L else 100L)
      val mean = g.sum / 64
      g.map(x => if (x > mean) '1' else '0').mkString
    }
    assert(viaAHash == word,
      "the 8x8 frame hash must equal q187's aHash on the framed bytes")
    viaQuery.collect() // chain runs green on a single sub-3-frame video
  }

  test("corpus report: cells partition the corpus; duplicate mass matches q40") {
    val rows = operators.CorpusOps.corpusReport(spark, sf).collect()
    val docs = Tables(spark, sf).documents.count()
    assert(rows.map(_.getLong(2)).sum == docs, "cells must partition all docs")
    assert(rows.forall(r => Set("duplicate", "contaminated", "clean")
      .contains(r.getString(1))))
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 10))
    // duplicate mass across deciles == q40's non-canonical count
    val dupMass = rows.filter(_.getString(1) == "duplicate").map(_.getLong(2)).sum
    val q40Dups = operators.Dedup.exactDedup(spark, sf)
      .agg(sum(col("n_copies") - 1)).head().getLong(0)
    assert(dupMass == q40Dups, s"$dupMass != $q40Dups")
  }

  test("personalized pagerank: positive mass only within the source's reach") {
    val ppr = GraphOps.personalizedPageRank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr.values.forall(_ >= 0))
    assert(ppr(1L) >= 150000L, "source keeps its teleport mass")
    // nodes with positive rank must be BFS-reachable from the source
    // within the same 10-hop horizon
    val reach = GraphOps.bfs(spark, sf).collect().map(_.getLong(0)).toSet
    val positive = ppr.collect { case (n, r) if r > 0 => n }.toSet
    assert(positive.subsetOf(reach + 1L),
      s"unreachable nodes with mass: ${(positive -- reach - 1L).take(5)}")
  }

  test("PQ recall gate: full recall on planted clusters; training lifts fixture recall") {
    import spark.implicits._
    // 16 tight clusters of center + 3 members; the 16 lowest ids are the
    // CENTERS, so the seed codebook fits the data perfectly. PQ cannot
    // rank WITHIN a cluster (same codes ⇒ equal ADC distance — the
    // documented quantization granularity), so each query's candidate
    // cluster holds exactly its 3 true neighbors: recall@3 must be full.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val rows = (0 until 16).map(c => (c.toLong, centers(c).toSeq)) ++
      (0 until 48).map { i =>
        val c = i % 16
        (16L + i,
          centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f).toSeq)
      }
    val vecs = rows.toDF("vec_id", "embedding")
    val recall = Similarity.pqRecallEvalFrom(vecs, queryMod = 40L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recall.nonEmpty)
    assert(recall.values.forall(_ == 3L),
      s"clustered corpus must give full recall@3: $recall")
    // fixture (isotropic synthetic embeddings): gate reports the truth —
    // recall in [0, 3], not fabricated high — and the registered trained
    // codebook must buy back recall over the untrained seed codebook
    // (0.1 → 0.3 mean hits at sf0.001; the residual gap is quantization
    // granularity, which training cannot remove)
    val fx = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val trained = Similarity.pqRecallEvalFrom(fx).collect()
    assert(trained.nonEmpty)
    assert(trained.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 3))
    val untrained = Similarity.pqRecallEvalFrom(fx, trainIters = 0).collect()
    assert(trained.map(_.getLong(1)).sum > untrained.map(_.getLong(1)).sum,
      s"training must improve fixture recall: trained=${
        trained.map(_.getLong(1)).sum} untrained=${
        untrained.map(_.getLong(1)).sum}")
  }

  test("grouped deciles: per-lang ntile semantics, balanced tile sizes") {
    val rows = operators.CorpusOps.groupedDeciles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.length
      // tile sizes: first n%10 tiles one row larger — the SQL ntile spec
      val sizes = rs.groupBy(_._4).view.mapValues(_.length).toMap
      (1L to math.min(10L, n.toLong)).foreach { t =>
        val expect = n / 10 + (if (t <= n % 10) 1 else 0)
        assert(sizes.getOrElse(t, 0) == expect, s"$lang tile $t")
      }
      // decile order follows (quality DESC, doc_id): sorting by that
      // order must produce non-decreasing deciles
      val ordered = rs.sortBy(r => (-r._3, r._1)).map(_._4)
      assert(ordered.sameElements(ordered.sorted), s"$lang decile order")
    }
  }

  test("residual IVFADC: round-trip, clustered recall, LUT dispatch parity") {
    import spark.implicits._
    // clustered corpus (see the recall-gate spec): each query's true
    // neighbors live in its own cluster, whose cell the probe covers
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val rows = (0 until 16).map(c => (c.toLong, centers(c).toSeq)) ++
      (0 until 48).map { i =>
        val c = i % 16
        (16L + i,
          centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f).toSeq)
      }
    val vecs = rows.toDF("vec_id", "embedding")
    val eq = vecs.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6)).cast("long")).as("e"))
    // residual round-trip: residualize is the exact integer subtraction
    // e − cents(cell), verified component-wise in the JVM
    val cents = Similarity.trainQuantizedCents(eq, 16,
      Similarity.IvfCoarseIters)
    val assigned = Similarity.assignQuantizedCells(eq, cents)
    val orig = assigned.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getSeq[Long](1)))).toMap
    val res = Similarity.residualize(assigned, cents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
    assert(res.nonEmpty)
    res.foreach { case (id, cell, re) =>
      val (ocell, oe) = orig(id)
      assert(cell == ocell)
      assert(re.indices.forall(i => re(i) == oe(i) - cents(cell.toInt)(i)),
        s"residual round-trip broke for vec $id")
    }
    // residual encoding spends the codebook on within-cell detail: on
    // the clustered corpus the trained index at nprobe=1 must recover
    // the full exact top-3 for every query (true neighbors share the
    // query's own cell; the residual codes separate them)
    val rec = Similarity.ivfAdcRecallEvalFrom(vecs, queryMod = 40L,
        nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rec.nonEmpty && rec.forall(_._2 == 3L),
      s"clustered residual recall@3 must be full: ${rec.toSeq}")
    // per-(query, cell) LUT dispatch: broadcast branch ≡ literal branch
    val seeds = eq.orderBy(col("vec_id")).limit(16)
      .collect().map(_.getSeq[Long](1).toArray)
    val cb = Array.tabulate(4)(m => seeds.map(_.slice(m * 16, (m + 1) * 16)))
    val qres = Similarity.residualize(assigned, cents)
      .filter(col("vec_id") % 8 === 0)
      .select(col("vec_id").as("query_id"), col("cell"), col("e"))
    def luts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Seq[Long]](2)).toMap
    val ll = luts(Similarity.pqQueryLutsLit(qres, cb))
    val lb = luts(Similarity.pqQueryLutsBcast(qres, cb))
    assert(ll.nonEmpty && ll == lb)
    // fixture: well-formed ranks, no self-matches
    val fx = Similarity.ivfAdcTopK(spark, sf).collect()
    assert(fx.nonEmpty)
    fx.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length))
      assert(rs.forall(_.getLong(2) != q))
    }
  }

  test("IVFADC re-rank: exact-L2 replay over the ADC shortlist; recall dominates plain ADC") {
    val fx = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = Similarity.ivfAdcRerankTopKFrom(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // brute-force replay: the registered shortlist (q159 at topK=R),
    // exact integer L2 in the JVM, same (dist, neighbor) tie-breaks
    val shortlist = Similarity
      .ivfAdcTopKFrom(fx, topK = Similarity.RerankShortlist).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val eq = fx.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(x * 1e6) AS BIGINT))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = shortlist.groupBy(_._1).toSeq.flatMap { case (q, ns) =>
      ns.map(n => (n._2, d(eq(q), eq(n._2))))
        .sortBy { case (n, dist) => (dist, n) }
        .take(3).zipWithIndex.map { case ((n, dist), i) =>
          (q, i + 1L, n, dist) }
    }.sortBy(x => (x._1, x._2))
    assert(out.toSeq.sortBy(x => (x._1, x._2)) == want,
      "served rank must replay exact L2 over the shortlist")
    // recall dominance: an exact-top-3 member inside the shortlist
    // always re-ranks into the served top-3, so re-rank hits >= plain
    // ADC hits — and on this fixture the lift is strict (ADC ranking
    // errors inside the shortlist are real here)
    val exact3 = eq.keys.filter(_ % 50 == 0).flatMap { q =>
      eq.keys.filter(_ != q).toSeq
        .map(n => (n, d(eq(q), eq(n))))
        .sortBy { case (n, dist) => (dist, n) }
        .take(3).map(n => (q, n._1))
    }.toSet
    val plain3 = Similarity.ivfAdcTopKFrom(fx).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val plainHits = plain3.count(exact3)
    val rerankHits = out.map(x => (x._1, x._3)).count(exact3)
    assert(rerankHits > plainHits,
      s"re-rank must lift fixture recall: $plainHits -> $rerankHits")
  }

  test("BPE: planted corpus trains the hand-computed merges; greedy direction pinned") {
    import spark.implicits._
    // aaa×5, ab×3 (héllo is non-ASCII → excluded from training, counts
    // 1 token). Hand-derivation: r1 (a,a) n=10 [two overlapping
    // positions per aaa]; greedy LEFT-to-right merge gives aaa→[aa,a],
    // so r2 learns (aa,a) n=5 — a right-to-left rule would learn
    // (a,aa) instead, which is what this pins; r3 (a,b) n=3; r4 no
    // pairs → early stop at 3 of BpeMerges=8 rounds.
    val docs = Seq(
      (10L, "aaa aaa aaa aaa"),
      (11L, "ab ab ab"),
      (12L, "héllo aaa")).toDF("doc_id", "text")
    val merges = operators.Bpe.bpeMergesFrom(spark, docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1L, "a", "a", 10L), (2L, "aa", "a", 5L), (3L, "a", "b", 3L)),
      s"planted merges: ${merges.toSeq}")
    val stats = operators.Bpe.bpeTokenStatsFrom(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.toSeq == Seq((10L, 4L, 4L), (11L, 3L, 3L), (12L, 2L, 2L)),
      s"planted token stats: ${stats.toSeq}")
    // fixture sanity: per doc, ws tokens <= bpe tokens <= non-space chars
    val fx = operators.Bpe.bpeTokenStats(spark, sf)
      .join(graft.Tables(spark, sf).documents, Seq("doc_id"))
      .select(col("n_ws_tokens"), col("n_bpe_tokens"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
      .collect()
    assert(fx.nonEmpty)
    fx.foreach { r =>
      assert(r.getLong(0) <= r.getLong(1) && r.getLong(1) <= r.getLong(2),
        s"token accounting out of range: $r")
    }
    // production-R encode: the fold-over-literal-array variant is
    // bit-identical to the replace chain on the fixture vocabulary at
    // the trained R=8 table (the dispatch threshold keeps the chain
    // registered; the fold is what R≈30k ships with)
    val fxDocs = graft.Tables(spark, sf).documents
    val wc = operators.Bpe.wordCounts(fxDocs)
    val trained = operators.Bpe.bpeMergesFrom(spark, fxDocs).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val chain = operators.Bpe.wordTokensChain(wc, trained).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val fold = operators.Bpe.wordTokensFold(wc, trained).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(fold == chain,
      "fold encode must be bit-identical to the replace chain")
  }

  test("trend slopes: planted linear series recovered exactly; JVM OLS replay on fixture") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // up: value = x dollars on day x -> slope 100 cents/day -> 1e8 pm
    // down: value = -2x -> slope -200 cents/day -> -2e8 pm (exact floor)
    val planted = (0 until 10).flatMap(x => Seq(
      ("up", ts(x), x.toDouble), ("down", ts(x), -2.0 * x)))
      .toDF("event_type", "ts", "value")
    val got = operators.Behavioral.trendSlopesFrom(planted).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("up", 10L, 100000000L), ("down", 10L, -200000000L)),
      s"planted slopes: $got")
    // fixture: JVM replay of the exact rule
    val daily = graft.Tables(spark, sf).events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => ((r.getString(0), r.getDate(1).toLocalDate
        .toEpochDay - java.time.LocalDate.parse("2024-01-01").toEpochDay),
        r.getLong(2)))
    val series = daily.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case ((t, x), y) => (t, x, y) }
    val want = series.groupBy(_._1).collect {
      case (t, pts) if pts.size >= 2 =>
        val n = pts.size.toLong
        val (sx, sy) = (pts.map(_._2).sum, pts.map(_._3).sum)
        val sxy = pts.map(p => p._2 * p._3).sum
        val sxx = pts.map(p => p._2 * p._2).sum
        (t, n, math.floor((n * sxy - sx * sy).toDouble * 1e6
          / (n * sxx - sx * sx).toDouble).toLong)
    }.toSet
    val fx = operators.Behavioral.trendSlopes(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fx == want, s"missing=${want -- fx} extra=${fx -- want}")
  }

  test("daily correlations: perfect co/anti-movement pinned; symmetric bounds hold") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // b = 2a + 5 (r = +1, corr_pm 1e6); c = -a (r = -1, floor -> -1e6)
    val planted = (0 until 8).flatMap(x => Seq(
      ("a", ts(x), x.toDouble), ("b", ts(x), 2.0 * x + 5),
      ("c", ts(x), -x.toDouble))).toDF("event_type", "ts", "value")
    val got = operators.Behavioral.dailyCorrelationsFrom(planted).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    assert(got(("a", "b")) == 1000000L, s"$got")
    assert(got(("a", "c")) == -1000000L, s"$got")
    assert(got(("b", "c")) == -1000000L, s"$got")
    // fixture: every pair present once (ta < tb), |corr_pm| bounded
    val fx = operators.Behavioral.dailyCorrelations(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(fx.nonEmpty)
    assert(fx.forall { case (ta, tb, c) =>
      ta < tb && c >= -1000000L && c <= 1000000L }, s"${fx.toSeq}")
    assert(fx.map(p => (p._1, p._2)).distinct.length == fx.length)
  }

  test("SCD2 build: intervals tile each user's timeline; read at probes == q163") {
    val rows = operators.Windows.scd2Build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // tiling: per user sorted validity, each valid_to == next valid_from,
    // exactly one open-ended sentinel (the last row)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"user $u: gap/overlap between $a and $b")
        case _ =>
      }
      assert(sorted.last._4 == -1L, s"user $u: last row must be open-ended")
      assert(sorted.init.forall(_._4 != -1L),
        s"user $u: only the last row may be open-ended")
    }
    // family coherence: reading the built dimension at q163's probe
    // instants must reproduce the point-in-time lookup exactly
    val probes = Seq("2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29")
      .map(d => d -> java.sql.Timestamp.valueOf(d + " 00:00:00").getTime * 1000L)
    val fromScd2 = (for {
      (pd, pUs) <- probes
      (u, rs) <- rows.groupBy(_._1)
      hit <- rs.filter(r => r._3 <= pUs && (r._4 == -1L || r._4 > pUs))
        .sortBy(r => (r._3, r._2)).lastOption
    } yield (u, pd, hit._2, hit._5)).toSet
    val q163 = operators.Joins.pointInTime(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(fromScd2 == q163, s"SCD2 read diverges from point-in-time: " +
      s"missing=${(q163 -- fromScd2).take(3)} extra=${(fromScd2 -- q163).take(3)}")
  }

  test("betweenness: hand-computed Brandes on path/diamond; multi-source sums") {
    import spark.implicits._
    def undirected(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    // path 1-2-3-4-5, source 1: delta_q(2)=3e6, (3)=2e6, (4)=1e6
    val path = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val p1 = GraphOps.betweennessFrom(spark, path, Seq(1L), 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1 == Map(2L -> 3000000L, 3L -> 2000000L, 4L -> 1000000L), s"$p1")
    // both ends as sources: interior nodes sum both dependencies
    val p2 = GraphOps.betweennessFrom(spark, path, Seq(1L, 5L), 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p2 == Map(2L -> 4000000L, 3L -> 4000000L, 4L -> 4000000L), s"$p2")
    // diamond 1-2-4, 1-3-4: sigma(4)=2 splits the dependency in half
    val diamond = undirected((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val d1 = GraphOps.betweennessFrom(spark, diamond, Seq(1L), 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == Map(2L -> 500000L, 3L -> 500000L), s"$d1")
    // fixture: well-formed — positive, no source/leaf-only artifacts
    val fx = GraphOps.betweennessSample(spark, sf).collect()
    assert(fx.nonEmpty && fx.forall(_.getLong(1) > 0))
  }

  test("hierarchy rollup: closed-form ancestor explode == JVM parent walk; root holds total") {
    val parts = graft.Tables(spark, sf).part
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val got = operators.Relational.hierarchyRollup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // JVM replay: walk parent(p) = (p-1)/2 to the root for every part
    val agg = scala.collection.mutable.Map[Long, (Long, Long)]()
    parts.foreach { case (p, c) =>
      var a = p
      while (a >= 0) {
        val (n, s) = agg.getOrElse(a, (0L, 0L))
        agg(a) = (n + 1, s + c)
        a = if (a >= 1) (a - 1) / 2 else -1L
      }
    }
    val want = agg.toSeq.filter(_._1 < 50).sortBy(_._1)
      .map { case (a, (n, s)) => (a, n - 1, s) }
    assert(got.toSeq == want, s"first diff: ${
      got.toSeq.zip(want).find { case (g, w) => g != w }}")
    // root subtree == whole-table total, in exact cents
    val total = parts.map(_._2).sum
    assert(got.find(_._1 == 0L).get._3 == total, "root must hold the total")
  }

  test("interval join: owning-bin plan == definitional theta join; endpoints closed") {
    import spark.implicits._
    // fixture equivalence: the binned plan must reproduce the plain
    // theta join row-for-row on the registered inputs
    val t = graft.Tables(spark, sf)
    val a = t.lineitem.filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").as("a_start"),
        expr("timestampadd(DAY, l_linenumber * 10, l_shipdate)").as("a_end"))
    val b = t.orders.filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_orderdate").as("b_start"),
        expr("timestampadd(DAY, 14, o_orderdate)").as("b_end"))
    val got = operators.Joins.intervalOverlapJoinFrom(a, b).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val want = a.join(b,
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"),
        (datediff(least(col("a_end"), col("b_end")),
          greatest(col("a_start"), col("b_start"))) + 1).cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty && got.toSet == want.toSet,
      s"binned != theta: missing=${(want.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- want.toSet).take(3)}")
    // closed endpoints across a month AND bin boundary: a ends exactly
    // where b starts -> included with overlap 1; shifted by a day -> gone
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val ca = Seq((9L, 1, ts("2024-01-05"), ts("2024-02-01")))
      .toDF("l_orderkey", "l_linenumber", "a_start", "a_end")
    val cb1 = Seq((5L, ts("2024-02-01"), ts("2024-02-10")))
      .toDF("o_orderkey", "b_start", "b_end")
    val cb2 = Seq((5L, ts("2024-02-02"), ts("2024-02-10")))
      .toDF("o_orderkey", "b_start", "b_end")
    val touch = operators.Joins.intervalOverlapJoinFrom(ca, cb1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(touch.toSeq == Seq((9L, 5L, 1L)), s"touching endpoint: ${touch.toSeq}")
    assert(operators.Joins.intervalOverlapJoinFrom(ca, cb2).collect().isEmpty,
      "disjoint-by-one-day intervals must not join")
  }

  test("dup-graph communities: planted families split; fixture refines q129 components") {
    import spark.implicits._
    // two exact-dup families (identical texts verify at agree = 64)
    // plus singletons, which are OUTSIDE the dup graph by contract
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b), (6L, b),
      (7L, "solo one of a kind document seven"),
      (8L, "another entirely unrelated singleton eight"))
      .toDF("doc_id", "text")
    val got = Dedup.dupGraphCommunitiesFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L),
      s"dup graph must cover exactly the paired docs: ${got.keySet}")
    assert(Set(1L, 2L, 3L).map(got).size == 1
      && Set(4L, 5L, 6L).map(got).size == 1
      && got(1L) != got(4L),
      s"families must form two communities: $got")
    // fixture: communities REFINE the q129 connected components (a
    // community never straddles two components — it partitions the
    // component's interior instead)
    val comm = Dedup.dupGraphCommunities(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(comm.nonEmpty)
    val canon = Dedup.fuzzyDedupKeep(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    comm.groupBy(_._2).values.foreach { g =>
      assert(g.map(x => canon(x._1)).toSet.size == 1,
        s"community straddles q129 components: ${g.toSeq}")
    }
  }

  test("quality perceptron: separable corpus converges, held-out docs classified") {
    import spark.implicits._
    // two distinct feature vectors ("spark fast engine" vs "slow legacy
    // engine", shared word + bias overlap = 2, |x|² = 4): round 1
    // updates on everything (margins 0), giving w = 4·(x₊ − x₋) on the
    // 8 training docs; margins are then ±4·(|x|² − overlap) = ±8 and
    // round 2 finds nothing misclassified — converged. Held-out ids
    // (1, 4, 7, 10) share the two vectors, so generalization is exact.
    val docs = (0L until 12L).map(i =>
        (i, if (i % 2 == 0) "spark fast engine" else "slow legacy engine"))
      .toDF("doc_id", "text")
    val got = operators.Classifier.qualityPerceptronFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length == 12)
    got.foreach { case (id, label, isTrain, margin, predicted) =>
      assert(label == (if (id % 2 == 0) 1L else -1L))
      assert(isTrain == (id % 3 != 1))
      assert(math.abs(margin) == 8L, s"doc $id margin $margin")
      assert(predicted == label,
        s"doc $id (train=$isTrain) misclassified: $predicted vs $label")
    }
    // fixture: the hashed model must actually learn the contains-
    // "spark" indicator — training accuracy well above the base rate
    val fx = operators.Classifier.qualityPerceptron(spark, sf).collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getLong(4)))
    val train = fx.filter(_._2)
    val acc = train.count(t => t._1 == t._3).toDouble / train.length
    val base = train.count(_._1 == -1L).toDouble / train.length
    assert(acc > base + 0.05 && acc > 0.7,
      s"fixture train accuracy $acc (base $base) — model did not learn")
  }

  test("video near-dup: aligned clip contained directionally; shuffled frames miss") {
    import spark.implicits._
    // frames = 64-byte runs of one letter. V = f0..f9; C = V's bytes
    // [128, 448) = frames f2..f6 (the 64-aligned clip cut); S = V's
    // frames REVERSED — same frame set, no shared temporal 3-gram.
    def frame(i: Int): String = ("" + ('a' + i).toChar) * 64
    val v = (0 until 10).map(frame).mkString
    val clip = v.substring(128, 448)
    val shuffled = (0 until 10).reverse.map(frame).mkString
    val docs = Seq((1L, v), (2L, clip), (3L, shuffled))
      .toDF("doc_id", "text")
    val rows = operators.Multimodal.videoNearDupFrom(docs).collect()
      .filter(!_.isNullAt(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // only the DIRECTED clip-in-video row: C has 3 temporal 3-grams,
    // all inside V (containment 10⁶); V→C is 3/8 < 1/2; the shuffled
    // copy shares frames but zero ordered 3-grams
    assert(rows.toSeq == Seq((2L, 1L, 3L, 3L, 1000000L)),
      s"video containment: ${rows.toSeq}")
  }

  test("audio energy: JVM PCM replay on a constructed payload; fixture well-formed") {
    import spark.implicits._
    // constructed payload: 3 frames of 64 samples — quiet, LOUD, quiet
    // (loud = alternating '!'/'~' pairs => large centered squares).
    // 128 ASCII chars per frame; peak must land on frame 1.
    val quiet = "ab" * 64
    val loud = "!~" * 64
    val text = quiet + loud + quiet
    val out = operators.Multimodal
      .audioEnergyFrom(Seq((7L, text)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // JVM replay of the documented rule
    val smp = text.getBytes("US-ASCII").grouped(2)
      .map(p => p(0).toLong + 256L * p(1)).toArray
    val dc = smp.sum / smp.length
    val zc = smp.sliding(2).count(p => (p(0) - dc) * (p(1) - dc) < 0)
    val fe = smp.grouped(64).map(_.map(x => (x - dc) * (x - dc)).sum).toArray
    val peak = fe.indexOf(fe.max).toLong
    assert(out.toSeq == Seq((7L, smp.length.toLong, 3L, dc, zc.toLong,
      peak, fe.max)), s"got ${out.toSeq}")
    assert(peak == 1L, "the loud frame must win")
    // fixture: one row per eligible doc, frames consistent with samples
    val fx = operators.Multimodal.audioEnergy(spark, sf).collect()
    assert(fx.nonEmpty)
    fx.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) / 64, s"frame count: $r")
      assert(r.getLong(5) < r.getLong(2), s"peak frame in range: $r")
      assert(r.getLong(6) >= 0, s"energy non-negative: $r")
    }
  }

  test("cluster-balanced sample: quota honored per cell, choice replays the Knuth rule") {
    val fx = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = Similarity.clusterBalancedSampleFrom(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // quota per cell, contiguous ranks
    out.groupBy(_._2).foreach { case (c, rs) =>
      assert(rs.length <= Similarity.ClusterSampleQuota, s"cell $c over quota")
      assert(rs.map(_._3).sorted.sameElements(1L to rs.length), s"cell $c ranks")
    }
    // JVM replay: the registered cell assignment (q142's rule via
    // kmeansCellsFrom at the same k/iters) + the carry-split Knuth
    // uniform with id tie-break must reproduce every selection
    val cells = Similarity.kmeansCellsFrom(fx, k = 16,
        iters = Similarity.IvfCoarseIters).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def knuth(c: Long): Long =
      (((c % 4294967296L) / 65536 * 2654435761L % 65536) * 65536
        + (c % 65536) * 2654435761L) % 4294967296L
    val want = cells.groupBy(_._2).toSeq.flatMap { case (c, vs) =>
      vs.map(_._1).sortBy(v => (knuth(v), v))
        .take(Similarity.ClusterSampleQuota)
        .zipWithIndex.map { case (v, i) => (v, c, i + 1L) }
    }.sortBy(x => (x._2, x._3))
    assert(out.toSeq.sortBy(x => (x._2, x._3)) == want)
    // the point of the operator: the sample is flatter than the corpus —
    // no cell exceeds quota even if the raw cell holds far more
    val rawMax = cells.groupBy(_._2).values.map(_.length).max
    assert(rawMax > Similarity.ClusterSampleQuota,
      "fixture must actually have a dense cell for the test to bite")
  }

  test("containment join: quote-inclusion found directed; Jaccard misses it") {
    import spark.implicits._
    // doc 100 (10 words, 3 distinct 8-grams) is quoted whole at the head
    // of doc 200 (50 words): c(100->200) = 1.0, c(200->100) = 3/43 —
    // only the directed row passes tau = 1/2
    val short = "qa qb qc qd qe qf qg qh qi qj"
    val long = short + " " + (1 to 40).map(i => s"u$i").mkString(" ")
    val corpus = Seq((100L, short), (200L, long)).toDF("doc_id", "text")
    val rows = Dedup.containmentJoinFrom(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq == Seq((100L, 200L, 3L, 3L, 1000000L, 0L, 0L)),
      s"got ${rows.toSeq}")
    // resemblance Jaccard structurally misses the same pair (union-large)
    assert(Dedup.jaccardJoinFrom(corpus).collect().isEmpty,
      "tau=0.8 Jaccard must miss the quote-inclusion pair")
  }

  test("containment join: all-hot corpus degenerates to the sentinel row") {
    // 1001 identical 8-word docs: the single gram's df exceeds the cap,
    // so zero pairs verify and the skipped mass must still surface
    val corpus = spark.range(1001).select(col("id").as("doc_id"),
      lit("h1 h2 h3 h4 h5 h6 h7 h8").as("text"))
    val rows = Dedup.containmentJoinFrom(corpus).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)
      && r.isNullAt(3) && r.isNullAt(4))
    assert(r.getLong(5) == 1L && r.getLong(6) == 1001L,
      s"skipped mass must be reported: $r")
  }

  test("edge weight: distributed-mod form == naive rule, safe at hash-scale ids") {
    import spark.implicits._
    // the routing family's synthetic weight, now computed with the mod
    // distributed over the product — must equal the naive (src*31+dst)%7+1
    // everywhere AND survive ids past Long.MaxValue/31 (murmur64 graphs)
    val ids = Seq((1L, 2L), (1234567L, 987654L),
      (Long.MaxValue / 31 + 5, Long.MaxValue - 2), (Long.MaxValue, Long.MaxValue))
    def naive(s: Long, d: Long): Long =
      ((BigInt(s) * 31 + BigInt(d)) % 7 + 1).toLong
    val got = ids.toDF("src", "dst")
      .select(GraphOps.edgeWeight(col("src"), col("dst")).as("w"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == ids.map { case (s, d) => naive(s, d) })
    assert(got.forall(w => w >= 1 && w <= 7))
    ids.foreach { case (s, d) =>
      assert(GraphOps.edgeWeightJvm(s, d) == naive(s, d)) }
  }

  test("novelty scores: dup docs 0, unique doc 1e6, mixed doc exact per-mille") {
    import spark.implicits._
    // doc1 == doc2 (every gram df 2 → novelty 0); doc3 all-unique
    // (novelty 10⁶); doc4 shares exactly its first window with doc1/2
    // (5 windows, 4 novel → 800000)
    val c = (1 to 12).map(i => s"c$i").mkString(" ")
    val u = (1 to 12).map(i => s"u$i").mkString(" ")
    val mixed = ((1 to 8).map(i => s"c$i") ++ (20 to 23).map(i => s"u$i"))
      .mkString(" ")
    val docs = Seq((1L, c), (2L, c), (3L, u), (4L, mixed))
      .toDF("doc_id", "text")
    val got = operators.TextAnalysis.noveltyScoresFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 5L, 0L, 0L), (2L, 5L, 0L, 0L),
      (3L, 5L, 5L, 1000000L), (4L, 5L, 4L, 800000L)),
      s"novelty: ${got.toSeq}")
  }

  test("BPE sequence pack: fixture map replays the cumulative BPE counts exactly") {
    // JVM replay: the pack map must be the exact integer cumulative sum
    // of q210's BPE counts in doc_id order, div/% Context = 2048
    val counts = operators.Bpe.bpeTokenStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    var cum = 0L
    val want = counts.map { case (id, n) =>
      val start = cum; cum += n
      (id, n, start, start / 2048L, start % 2048L)
    }.toSeq
    val got = operators.CorpusOps.bpeSequencePack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty && got == want)
    // the tokenizer-aware map genuinely differs from the whitespace map
    // (the expansion factor is the point of the rung)
    val ws = operators.CorpusOps.sequencePack(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.exists { case (id, _, _, pid, _) => ws(id) != pid })
  }

  test("span units: planted verbatim passage flags true, mosaic of phrases false") {
    import spark.implicits._
    // Mosaic construction: C = A·B (16 tokens); D = A·B[1..7]·d1 covers
    // every junction window of C; E = B covers C's tail window. So ALL
    // 9 of C's windows are duplicated somewhere → one maximal 16-token
    // run — but the 16-token UNIT exists only in C (mosaic, verbatim =
    // false). Verbatim construction: F and G each embed the identical
    // 12-token passage P behind unique padding — both maximal runs are
    // exactly P's 5 windows, equal digests → verbatim = true.
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val b7 = (1 to 7).map(i => s"b$i").mkString(" ")
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a $b"),
      (2L, s"$a $b7 d1"),
      (3L, b),
      (4L, s"f1 f2 $p f3"),
      (5L, s"g1 $p g2 g3")).toDF("doc_id", "text")
    val got = Dedup.spanUnitsFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getBoolean(6)))
    assert(got.toSeq == Seq(
      (1L, 1L, 16L, 9L, 1L, false),  // the mosaic: all windows covered,
                                     // unit exists nowhere else
      (2L, 1L, 15L, 8L, 1L, false),
      (3L, 1L, 8L, 1L, 1L, false),
      (4L, 3L, 12L, 5L, 2L, true),   // the verbatim passage, both copies
      (5L, 2L, 12L, 5L, 2L, true)),
      s"span units: ${got.toSeq}")
    // the two verbatim rows must share their digest; the mosaics not
    val dig = Dedup.spanUnitsFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(dig(4L) == dig(5L) && dig(1L) != dig(2L))
  }

  test("repeated spans: planted k-token span found with exact boundaries") {
    import spark.implicits._
    // a 20-token span shared verbatim by docs 1 and 2 at different
    // offsets; the rest of each doc is unique. n=8 windows: the span
    // yields 20-8+1 = 13 consecutive duplicated windows in each doc.
    val span = (1 to 20).map(i => s"sp$i").mkString(" ")
    val d1 = (1 to 5).map(i => s"aa$i").mkString(" ") + " " + span +
      " " + (1 to 4).map(i => s"bb$i").mkString(" ")
    val d2 = (1 to 9).map(i => s"cc$i").mkString(" ") + " " + span
    val d3 = (1 to 30).map(i => s"un$i").mkString(" ") // all unique
    // d4 repeats ITS OWN 10 tokens twice — within-doc repetition counts
    val rep10 = (1 to 10).map(i => s"rr$i").mkString(" ")
    val d4 = rep10 + " zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 " + rep10
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4))
      .toDF("doc_id", "text")
    val out = operators.Dedup.repeatedSpansFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exact boundaries: d1's span starts at token 6, d2's at token 10;
    // both are 20 tokens = 13 windows. d3 contributes nothing. d4's two
    // copies of the 10-token run each give 3 windows (10-8+1).
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 6L, 20L, 13L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 10L, 20L, 13L)))
    assert(!out.exists(_._1 == 3L))
    assert(out.filter(_._1 == 4L).toSeq ==
      Seq((4L, 1L, 10L, 3L), (4L, 19L, 10L, 3L)))
    // documents shorter than the window are silently span-free
    val short = Seq((9L, "only five little words here")).toDF("doc_id", "text")
    assert(operators.Dedup.repeatedSpansFrom(short).collect().isEmpty)
    // the cleaning tier (q193): the lexicographically-first occurrence
    // survives — doc 1 keeps the span, doc 2 loses all 20 tokens, and
    // doc 4 keeps the FIRST copy of its self-repeated 10-token run
    val cleaned = operators.Dedup.spanDedupCleanFrom(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(cleaned(1L) == ((29L, 0L, d1)), cleaned(1L).toString)
    assert(cleaned(2L)._2 == 20L)
    assert(cleaned(2L)._3 == (1 to 9).map(i => s"cc$i").mkString(" "))
    assert(cleaned(3L) == ((30L, 0L, d3)))
    assert(cleaned(4L)._2 == 10L)
    assert(cleaned(4L)._3 ==
      rep10 + " zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8")
  }

  test("span decontamination: quoted benchmark passage masked, context kept") {
    import spark.implicits._
    // a 12-token benchmark passage; any corpus doc quoting it loses
    // exactly those 12 tokens (the windows fully inside the quote are in
    // the benchmark set; straddling windows carry corpus context and
    // are not) — ALL occurrences drop, no canonical-survivor rule
    val passage = (1 to 12).map(i => s"bm$i").mkString(" ")
    val bench = Seq((100L, "eval filler intro " + passage + " outro words"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "c1 c2 c3 " + passage + " c4 c5"),
      (2L, (1 to 20).map(i => s"own$i").mkString(" ")),
      (3L, passage + " mid1 mid2 " + passage)).toDF("doc_id", "text")
    val out = operators.TextAnalysis.spanDecontaminateFrom(corpus, bench)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((17L, 12L, "c1 c2 c3 c4 c5")), out(1L).toString)
    assert(out(2L)._2 == 0L &&
      out(2L)._3 == (1 to 20).map(i => s"own$i").mkString(" "))
    assert(out(3L) == ((26L, 24L, "mid1 mid2")), out(3L).toString)
  }

  test("trained IVF coarse cells: Lloyd collapses quantization error on clustered data") {
    import spark.implicits._
    // adversarial seeding: the 16 lowest ids (= the seed centroids) all
    // sit in ONE tight cluster, while 7 other well-separated clusters
    // hold the rest of the corpus — the case where an untrained coarse
    // quantizer is worst (every distant cluster lumps onto whichever
    // near-identical seed is closest). Training must migrate cells onto
    // the actual density: the k-means objective (total within-cell
    // integer squared L2) collapses, and the IVFADC recall at nprobe=1
    // cannot get worse.
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    def member(c: Int): Seq[Float] =
      centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f).toSeq
    val rows = (0 until 16).map(i => (i.toLong, member(0))) ++
      (0 until 70).map(i => (16L + i, member(1 + i % 7)))
    val vecs = rows.toDF("vec_id", "embedding")
    def objective(iters: Int): Long =
      Similarity.kmeansCellsFrom(vecs, 16, iters)
        .agg(sum(col("dist_q"))).head().getLong(0)
    val seeded = objective(0)
    val trained = objective(Similarity.IvfCoarseIters)
    assert(trained * 3 < seeded,
      s"Lloyd must collapse the clustered objective: $seeded -> $trained")
    def recall1(coarse: Int): Long =
      Similarity.ivfAdcRecallEvalFrom(vecs, queryMod = 40L, nprobe = 1,
          coarseIters = coarse)
        .agg(sum(col("recall3"))).head().getLong(0)
    assert(recall1(Similarity.IvfCoarseIters) >= recall1(0))
    // the bounded-training-sample path (the 100 TB posture: each Lloyd
    // pass scans a fixed sample, assignment covers everything): cells
    // trained on the vec_id % 2 half must still collapse the FULL
    // corpus's objective — cluster structure survives sampling.
    val eqFull = vecs.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6)).cast("long")).as("e"))
    val sampled = Similarity.trainQuantizedCents(eqFull, 16,
      Similarity.IvfCoarseIters, sampleMod = 2L)
    val sampledObj = Similarity.assignQuantizedCells(eqFull, sampled)
      .agg(sum(col("dist_q"))).head().getLong(0)
    assert(sampledObj * 3 < seeded,
      s"sample-trained cells must still collapse: $seeded -> $sampledObj")
  }

  test("two-hop counts: hand-checked path and triangle") {
    import spark.implicits._
    // path 1-2-3: 1 and 3 see each other at distance 2; 2 sees nothing new
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val p = GraphOps.twoHopCountsFrom(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p == Map(1L -> 1L, 2L -> 0L, 3L -> 1L))
    // triangle: every 2-path endpoint is already a direct neighbor
    val t3 = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val t = GraphOps.twoHopCountsFrom(t3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("two-hop counts: planted hub is capped and its mass reported") {
    import spark.implicits._
    // star: hub 1000 ↔ leaves 1..100 (degree 100), plus a mild path
    // 5000-5001-5002 untouched by the cap
    val star = (1L to 100L).flatMap(l => Seq((1000L, l), (l, 1000L)))
    val path = Seq((5000L, 5001L), (5001L, 5000L),
      (5001L, 5002L), (5002L, 5001L))
    val ue = (star ++ path).toDF("src", "dst")
    // uncapped: each leaf sees the 99 other leaves; summary columns 0
    val exact = GraphOps.twoHopCountsFrom(ue).collect()
    assert(exact.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
    val em = exact.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(em(1L) == 99L && em(1000L) == 0L && em(5000L) == 1L)
    // cap 64 < hub degree 100: hub-mediated wedges refused, the mild
    // path's exact counts survive, skipped mass = deg·(deg−1) = 9900
    val capped = GraphOps.twoHopCountsFrom(ue, midDegCap = 64).collect()
    assert(capped.forall(r =>
      r.getLong(2) == 1L && r.getLong(3) == 100L * 99L))
    val cm = capped.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cm(1L) == 0L && cm(1000L) == 0L)
    assert(cm(5000L) == 1L && cm(5001L) == 0L && cm(5002L) == 1L)
    // the registered cap (256) leaves this graph exact
    val reg = GraphOps
      .twoHopCountsFrom(ue, midDegCap = GraphOps.TwoHopMidDegCap).collect()
    assert(reg.map(r => r.getLong(0) -> r.getLong(1)).toMap == em)
    assert(reg.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
  }

  test("error sessions: counts consistent with plain sessions, flag rule exact") {
    val es = graft.streaming.EventStreams.errorSessions(spark, sf).collect()
    assert(es.nonEmpty)
    es.foreach { r =>
      val (n, errs, pm, flag) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(errs >= 0 && errs <= n)
      assert(pm == 1000 * errs / n)
      assert(flag == (pm >= 500))
    }
    // same sessionization as q62: identical (user, start) keys
    val plain = graft.streaming.EventStreams.sessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es.map(r => (r.getLong(0), r.getLong(1))).toSet == plain)
  }

  test("dedup savings: totals reconcile with the q129 keep-list") {
    val sv = Dedup.dedupSavings(spark, sf).collect()
    assert(sv.forall(_.getLong(1) > 1), "only duplicate clusters")
    val kl = Dedup.fuzzyDedupKeep(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val dropped = kl.filter { case (d, c) => d != c }.map(_._1).toSet
    val toks = Tables(spark, sf).documents
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantSaved = dropped.toSeq.map(toks).sum
    assert(sv.map(_.getLong(3)).sum == wantSaved,
      s"savings ${sv.map(_.getLong(3)).sum} != $wantSaved")
  }

  test("quality drift: exact rational sign agrees with float means; splits correct") {
    val rows = operators.CorpusOps.qualityDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (oldN, newN, oldQ, newQ, num, den) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(den == oldN * newN)
      assert(num == newQ * oldN - oldQ * newN)
      if (oldN > 0 && newN > 0) {
        val floatDrift = newQ.toDouble / newN - oldQ.toDouble / oldN
        assert(math.signum(num.toDouble) == math.signum(floatDrift) ||
          floatDrift == 0.0, s"${r.getString(0)}")
      }
    }
  }

  test("integrity audit: star-schema fixture has zero dangling keys") {
    val rows = operators.Relational.integrityAudit(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L, s"${r.getString(0)} dangles")
      assert(r.getLong(1) > 0L)
    }
    // row counts match the raw tables
    val t = Tables(spark, sf)
    val counts = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("lineitem->orders") == t.lineitem.count())
    assert(counts("orders->customer") == t.orders.count())
  }

  test("reciprocity: matches an in-memory recount over the directed edges") {
    val r = GraphOps.reciprocity(spark, sf).head()
    val edges = GraphOps.directedEdges(Tables(spark, sf)).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val recip = edges.count { case (s, d) => edges.contains((d, s)) }
    assert(r.getLong(0) == edges.size && r.getLong(1) == recip)
    assert(r.getDouble(2) == recip.toDouble / edges.size)
  }

  test("PQ ADC top-k matches an in-memory model exactly") {
    val emb = Tables(spark, sf).embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val eq = emb.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1e6).toLong)
    }
    val seeds = eq.take(16).map(_._2)
    def subDist(a: Array[Long], b: Array[Long], m: Int): Long =
      (0 until 16).map { i =>
        val d = a(m * 16 + i) - b(m * 16 + i); d * d
      }.sum
    // encode: argmin codeword per sub-space, ties to lowest j
    val codes = eq.map { case (id, v) =>
      id -> Array.tabulate(4) { m =>
        (0 until 16).minBy(j => (subDist(v, seeds(j), m), j))
      }
    }.toMap
    val model = for {
      (qid, qv) <- eq.filter(_._1 % 50 == 0)
    } yield {
      val ranked = eq.filter(_._1 != qid).map { case (xid, _) =>
        val adc = (0 until 4).map(m => subDist(qv, seeds(codes(xid)(m)), m)).sum
        (xid, adc)
      }.sortBy { case (xid, adc) => (adc, xid) }.take(3)
      qid -> ranked
    }
    val got = Similarity.pqAdcTopK(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq
      }
    model.foreach { case (qid, exp) =>
      assert(got(qid) == exp.toSeq, s"query $qid")
    }
    assert(got.size == model.length)
  }

  test("knuth hash carry-split survives doc_id past the ANSI overflow cliff (q112/q141/q191)") {
    import graft.operators.CorpusOps
    import spark.implicits._
    // ids straddling Long.MaxValue / 2654435761 ≈ 3.47e9 — the point where
    // the naive `doc_id * 2654435761L` throws ARITHMETIC_OVERFLOW under
    // Spark's default ANSI mode. A 100 TB corpus holds 5e9–5e10 docs, so
    // the sampling family must stay exact out to Long.MaxValue.
    val ids = Seq(1L, 999L, 3474700000L, 3500000017L, 5000000003L,
      50000000011L, (1L << 52) + 9L, Long.MaxValue)
    val docs = ids.map(i => (i, "en", s"plain sample text body number $i"))
      .toDF("doc_id", "lang", "text")
    // bit-exact replay of (id * A) mod 2^32 in unbounded arithmetic
    def ref(id: Long): Long =
      ((BigInt(id) * CorpusOps.KnuthA) % BigInt(4294967296L)).toLong
    if (spark.conf.get("spark.sql.ansi.enabled") == "true")
      intercept[Exception] { // the naive form really does overflow here
        docs.select((col("doc_id") * lit(CorpusOps.KnuthA)).as("x"))
          .collect()
      }
    val s = CorpusOps.stratifiedSampleFrom(docs).collect()
    assert(s.map(_.getAs[Long]("doc_id")).toSeq == ids.sorted)
    assert(s.map(_.getAs[Long]("bucket_pm")).toSeq ==
      ids.sorted.map(ref(_) % 1000))
    val sh = CorpusOps.shardAssignmentFrom(docs).collect()
    assert(sh.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard")))
      .toMap == ids.map(i => i -> ref(i) % 32).toMap)
    val ws = CorpusOps.weightedSampleFrom(docs).collect()
    assert(ws.length == ids.length)
    ws.foreach { r =>
      val (id, w, p) = (r.getAs[Long]("doc_id"), r.getAs[Long]("weight"),
        r.getAs[Long]("priority"))
      assert(w >= 1L)
      assert(p == (ref(id) + 1L) * 1000000L / w, s"priority of $id")
    }
    // the output really is ordered by (priority, doc_id)
    val ord = ws.map(r => (r.getAs[Long]("priority"), r.getAs[Long]("doc_id")))
    assert(ord.toSeq == ord.toSeq.sorted)
  }

  test("RAG retrieval (q223): provenance decodes to real chunks; recall gate vs exact chunk brute force") {
    val t = graft.Tables(spark, sf)
    val out = Similarity.ragRetrieval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    // well-formed serving rows: dense ranks 1..k per query, no chunk
    // retrieving itself
    out.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length), s"query $q")
      assert(rs.forall(r => r._3 * 1048576L + r._4 != q), s"self-match $q")
    }
    // provenance: every (doc_id, chunk_idx) the serving rows cite — and
    // every query id — decodes to a chunk that q144's chunker actually
    // produced for that document
    val chunks = graft.operators.CorpusOps.chunkWindowsFrom(t.documents)
      .select(col("doc_id"), col("chunk_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (q, _, d, c, _) =>
      assert(chunks.contains((d, c)), s"retrieved non-chunk ($d, $c)")
      assert(chunks.contains((q / 1048576L, q % 1048576L)),
        s"query $q is not a chunk")
    }
    // the embed fixture really is the documented borrow: spot-check one
    // retrieved chunk's vector against embeddings[(cid*37+11) mod nv]
    val cv = Similarity.chunkVectors(t.documents, t.embeddings)
    val nv = t.embeddings.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val someCid = out.head._3 * 1048576L + out.head._4
    val got = cv.filter(col("vec_id") === someCid).head().getSeq[Float](1)
    val want = t.embeddings
      .filter(col("vec_id") === ((someCid * 37L + 11L) % nv + nv) % nv)
      .head().getSeq[Float](1)
    assert(got == want, "embed fixture drifted from the documented rule")
    // recall gate: the trained index must recover most of the EXACT
    // chunk-level top-3 (the brute-force serving truth) — the gate an
    // ANN deployment reads before switching retrieval traffic
    val rec = Similarity.ivfAdcRecallEvalFrom(cv).collect()
      .map(_.getLong(1))
    assert(rec.nonEmpty)
    val mean = rec.sum.toDouble / (3.0 * rec.length)
    assert(mean >= 0.30, f"chunk-level IVFADC recall@3 too low: $mean%.3f")
  }

  test("RAG context pack (q225): greedy prefix packing, exact chunk token mass") {
    val t = graft.Tables(spark, sf)
    val out = Similarity
      .ragContextPackFrom(spark, t.documents, t.embeddings).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.nonEmpty)
    val tok = graft.operators.CorpusOps.chunkWindowsFrom(t.documents)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out.groupBy(_._1).foreach { case (q, rows) =>
      val rs = rows.sortBy(_._2)
      assert(rs.map(_._2).sameElements(1L to rs.length), s"ranks of $q")
      // token counts are q144's, the running sum is exact, and the
      // packing rule is the greedy cumulative budget
      var cum = 0L
      rs.foreach { case (_, _, d, c, n, cumGot, in) =>
        assert(n == tok((d, c)), s"chunk tokens of ($d,$c)")
        cum += n
        assert(cumGot == cum)
        assert(in == (cum <= Similarity.ContextBudgetTokens))
      }
      // in_context is a PREFIX of the rank order (greedy never back-fills)
      val flags = rs.map(_._7)
      assert(!flags.sliding(2).exists(p => p.length == 2 && !p(0) && p(1)),
        s"non-prefix packing for $q: ${flags.toSeq}")
    }
    // the budget really bites on this fixture: some query evicts a
    // retrieved chunk, and every query keeps at least its top chunk
    assert(out.exists(!_._7), "budget never evicted — gate is vacuous")
    assert(out.filter(_._2 == 1L).forall(_._7), "rank-1 chunk must fit")
  }

  test("bigram surprisal (q228): hand-computed quanta; repetition scores low; 1-token docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),   // predictable continuations — low surprisal
      (2L, "a b c d"),   // one rare continuation + two unique bigrams
      (3L, "x")          // no bigrams — no row
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.bigramSurprisalFrom(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // corpus model: c(a,·) = 4 (a→a ×3, a→b), c(a,a) = 3, all other
    // bigrams and prefixes count 1
    def q(cp: Long, cb: Long) = math.floor(math.log(cp.toDouble / cb) * 1e4).toLong
    val wantD1 = 3L * q(4, 3)                 // three a→a pairs
    val wantD2 = q(4, 1) + q(1, 1) + q(1, 1)  // a→b rare; b→c, c→d certain
    assert(out(1L) == ((3L, wantD1, wantD1 / 3L)))
    assert(out(2L) == ((3L, wantD2, wantD2 / 3L)))
    assert(!out.contains(3L), "a 1-token doc has no bigrams and no row")
    assert(out(1L)._3 < out(2L)._3,
      "repetitive text must score below diverse text")
  }

  test("BM25 (q229): matches an in-JVM replay; rare shared terms dominate common ones") {
    import spark.implicits._
    val t = graft.Tables(spark, sf)
    val got = TextAnalysis.bm25TopKFrom(t.documents).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2) * 1048576L + r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty)
    // independent replay in plain Scala (same IEEE op order)
    val chunks = graft.operators.CorpusOps.chunkWindowsFrom(t.documents)
      .select((col("doc_id") * lit(1048576L) + col("chunk_idx")).as("cid"),
        col("n_chunk_tokens"), col("chunk_text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2).split(" ")))
    val n = chunks.length.toLong
    val avgdl = chunks.map(_._2).sum.toDouble / n
    val tf = chunks.map { case (cid, len, ws) =>
      (cid, len, ws.groupBy(identity).map { case (w, g) => w -> g.length.toLong })
    }
    val df = tf.flatMap(_._3.keys).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val idfQ = df.map { case (w, d) =>
      w -> math.floor(math.log((n - d + 0.5) / (d + 0.5) + 1.0) * 1e4).toLong }
    // the serving-time posting bound: per term, top-P postings by the
    // quantized impact, (impact desc, cid) rank — the same rule the
    // engine and oracle apply
    val keptPost: Map[String, Map[Long, Long]] = tf
      .flatMap { case (cid, len, m) =>
        m.map { case (w, f) => (w, cid, len, f) } }
      .groupBy(_._1).map { case (w, ps) =>
        w -> ps.map { case (_, cid, len, f) =>
          (cid, math.floor(idfQ(w) * ((f * 2.2) /
            (f + 1.2 * (0.25 + 0.75 * len / avgdl)))).toLong)
        }.sortBy { case (cid, imp) => (-imp, cid) }
          .take(graft.operators.TextAnalysis.Bm25PostingBound).toMap
      }
    val want = tf.filter(_._1 % 50 == 0).flatMap { case (qid, _, qtf) =>
      // the serving-time query-term bound: top-m idf terms, (idf desc,
      // term) rank — the same rule the engine and oracle apply
      val kept = qtf.keys.toSeq.map(w => (w, idfQ(w)))
        .sortBy { case (w, iq) => (-iq, w) }
        .take(graft.operators.TextAnalysis.Bm25QueryTermBound)
        .map(_._1)
      val scored = tf.filter(_._1 != qid).map { case (cid, _, _) =>
        val s = kept.flatMap { w => keptPost(w).get(cid) }
        (cid, s.sum, s.nonEmpty)
      }.collect { case (cid, s, true) => (cid, s) }
      scored.sortBy { case (cid, s) => (-s, cid) }
        .take(graft.operators.TextAnalysis.Bm25TopK).zipWithIndex
        .map { case ((cid, s), i) => (qid, i + 1L, cid, s) }
    }.sortBy(x => (x._1, x._2))
    assert(got.sortBy(x => (x._1, x._2)) == want.toSeq,
      "served BM25 ranking must replay the scoring rule exactly")
    // rare-term dominance: a candidate sharing only a RARE query term
    // outranks one sharing only the corpus's most common term
    val docs = Seq(
      (1000L, "zebra " + Seq.fill(39)("the").mkString(" ")),  // query-ish
      (1050L, "zebra " + Seq.fill(39)("filler").mkString(" ")),
      (1051L, "the "   + Seq.fill(39)("filler").mkString(" "))
    ) ++ (1L to 30L).map(i => (i, Seq.fill(40)("the").mkString(" ")))
    val out = TextAnalysis.bm25TopKFrom(
      docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val q1000 = out.filter(_._1 == 1000L * 1048576L).sortBy(_._2)
    assert(q1000.nonEmpty && q1000.head._3 == 1050L,
      s"rare shared term must rank first: ${q1000.toSeq}")
  }

  test("BM25 query-term bound (q229): inert when queries fit; fixture divergence measured") {
    import spark.implicits._
    val t = graft.Tables(spark, sf)
    def served(docs: org.apache.spark.sql.DataFrame, tb: Int) =
      TextAnalysis.bm25TopKFrom(docs, termBound = tb).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2) * 1048576L + r.getLong(3), r.getLong(4))).toSeq
        .sortBy(x => (x._1, x._2))
    // (a) INERT below the bound: a corpus whose queries carry ≤ m
    // distinct terms serves bit-identically with and without the bound
    // (the bound drops nothing — pure guard, zero semantic cost)
    val narrow = (1L to 60L)
      .map(i => (i, Seq.fill(40)("w" + (i % 12)).mkString(" ")))
      .toDF("doc_id", "text")
    assert(served(narrow, TextAnalysis.Bm25QueryTermBound)
        == served(narrow, Int.MaxValue),
      "bound must be a no-op when every query fits inside it")
    // (b) REALISTIC (Zipf) vocabulary: a deterministic corpus with a
    // few stopwords, a mid tier, and a long rare tail — the regime the
    // bound is built for. The kept top-m idf terms are the rare,
    // short-posting-list ones that carry nearly all the score mass, so
    // the served set stays close to the unbounded definition.
    def zh(i: Long, j: Int): Long =
      ((i * 1000003L + j * 7919L) * 2654435761L) & 0x7fffffffL
    def zword(hv: Long): String = {
      val b = hv % 100
      if (b < 45) "c" + (hv % 5)
      else if (b < 75) "m" + (hv % 30)
      else "r" + (hv % 400)
    }
    val zipf = (1L to 300L).map(i =>
        (i, (0 until 40).map(j => zword(zh(i, j))).mkString(" ")))
      .toDF("doc_id", "text")
    def overlapOf(docs: org.apache.spark.sql.DataFrame): (Double, Int) = {
      val bs = served(docs, TextAnalysis.Bm25QueryTermBound)
        .map(x => (x._1, x._3)).toSet
      val us = served(docs, Int.MaxValue).map(x => (x._1, x._3)).toSet
      ((bs & us).size.toDouble / us.size, us.size)
    }
    val (zOv, zN) = overlapOf(zipf)
    info(f"Zipf-vocab served-set overlap = $zOv%.3f (n=$zN)")
    assert(zOv >= 0.8,
      f"bounded serving must track the definition on a Zipf vocabulary: $zOv%.3f")
    // (c) the registered fixture's 31-term vocabulary is the DOCUMENTED
    // worst case — every term is frequent, idf is near-flat, scores are
    // near-ties, so membership past the bound is fragile; measured and
    // recorded (SCALING.md), floor-asserted only
    val (fOv, fN) = overlapOf(t.documents)
    info(f"fixture (31-term worst case) served-set overlap = $fOv%.3f (n=$fN)")
    assert(fOv >= 0.3,
      f"even the degenerate-vocabulary overlap has a floor: $fOv%.3f")
  }

  test("BM25 posting bound (q229/q243): inert when lists fit; binding prune measured; report exact") {
    import spark.implicits._
    val t = graft.Tables(spark, sf)
    def served(docs: org.apache.spark.sql.DataFrame, pb: Int) =
      TextAnalysis.bm25TopKFrom(docs, postingBound = pb).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2) * 1048576L + r.getLong(3), r.getLong(4))).toSeq
        .sortBy(x => (x._1, x._2))
    // (a) INERT below the bound: every posting list fits → the prune
    // drops nothing and serving is bit-identical (pure guard)
    val narrow = (1L to 60L)
      .map(i => (i, Seq.fill(40)("w" + (i % 12)).mkString(" ")))
      .toDF("doc_id", "text")
    assert(served(narrow, TextAnalysis.Bm25PostingBound)
        == served(narrow, Int.MaxValue),
      "bound must be a no-op when every posting list fits inside it")
    // (b) BINDING on the Zipf corpus (stopword lists ≫ bound): the
    // dropped postings are each term's lowest-impact tail, so the
    // served set tracks the unbounded definition
    def zh(i: Long, j: Int): Long =
      ((i * 1000003L + j * 7919L) * 2654435761L) & 0x7fffffffL
    def zword(hv: Long): String = {
      val b = hv % 100
      if (b < 45) "c" + (hv % 5)
      else if (b < 75) "m" + (hv % 30)
      else "r" + (hv % 400)
    }
    val zipf = (1L to 300L).map(i =>
        (i, (0 until 40).map(j => zword(zh(i, j))).mkString(" ")))
      .toDF("doc_id", "text")
    val pruned = TextAnalysis
      .bm25PruneReportFrom(zipf).head()
    assert(pruned.getLong(4) > 0,
      s"the Zipf stopword lists must overflow the bound: $pruned")
    def overlapOf(docs: org.apache.spark.sql.DataFrame): (Double, Int) = {
      val bs = served(docs, TextAnalysis.Bm25PostingBound)
        .map(x => (x._1, x._3)).toSet
      val us = served(docs, Int.MaxValue).map(x => (x._1, x._3)).toSet
      ((bs & us).size.toDouble / us.size, us.size)
    }
    val (zOv, zN) = overlapOf(zipf)
    info(f"Zipf-vocab posting-bound served-set overlap = $zOv%.3f (n=$zN)")
    assert(zOv >= 0.7,
      f"bounded serving must track the definition on a Zipf vocabulary: $zOv%.3f")
    // (c) the 31-term fixture is again the documented worst case —
    // and a WORSE one than for the term bound: every posting list is
    // corpus-wide, so pruning to 128 collapses the candidate pool to
    // the globally shortest chunks while the unbounded near-tie top-5
    // spreads over the whole corpus (measured 0.053 at sf0.001,
    // SCALING.md). The Zipf row above is the regime the bound is FOR;
    // this row is the honest floor on a corpus that cannot be pruned.
    val (fOv, fN) = overlapOf(t.documents)
    info(f"fixture posting-bound served-set overlap = $fOv%.3f (n=$fN)")
    assert(fOv >= 0.04,
      f"even the degenerate-vocabulary overlap has a floor: $fOv%.3f")
    // (d) the q243 report is exact on a constructed corpus: one
    // corpus-wide term (df 10) + ten singletons, bound 3 →
    // 11 terms, 1 pruned, 20 postings = 13 kept + 7 skipped
    val tiny = (1L to 10L)
      .map(i => (i, ("x " + (s"u$i " * 39)).trim)).toDF("doc_id", "text")
    val rep = TextAnalysis.bm25PruneReportFrom(tiny, postingBound = 3)
      .head()
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2),
        rep.getLong(3), rep.getLong(4)) == ((11L, 1L, 20L, 13L, 7L)),
      s"prune report must be exact: $rep")
  }

  test("hybrid RRF (q230): matches the integer fusion replay; both rankers contribute") {
    val t = graft.Tables(spark, sf)
    val got = Similarity.hybridRrfFrom(spark, t.documents, t.embeddings)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2) * 1048576L + r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty)
    def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0),
        r.getLong(2) * 1048576L + r.getLong(3), r.getLong(1))).toSeq
    val dense = ranks(Similarity.ragRetrievalFrom(spark, t.documents,
      t.embeddings, topK = Similarity.RrfDepth))
    val lex = ranks(TextAnalysis.bm25TopKFrom(t.documents,
      topK = Similarity.RrfDepth))
    val want = (dense ++ lex)
      .map { case (q, c, rk) =>
        ((q, c), Similarity.RrfScale / (Similarity.RrfK + rk)) }
      .groupBy(_._1).map { case ((q, c), xs) => (q, c, xs.map(_._2).sum) }
      .toSeq.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
        cs.sortBy { case (_, c, s) => (-s, c) }
          .take(Similarity.RrfTopK).zipWithIndex
          .map { case ((_, c, s), i) => (q, i + 1L, c, s) }
      }.sortBy(x => (x._1, x._2))
    assert(got.sortBy(x => (x._1, x._2)) == want,
      "fused ranking must replay the integer RRF rule exactly")
    // the fusion is not a pass-through of either ranker on this fixture
    val denseTop = dense.filter(_._3 <= Similarity.RrfTopK)
      .map(x => (x._1, x._3, x._2)).sortBy(x => (x._1, x._2))
    val lexTop = lex.filter(_._3 <= Similarity.RrfTopK)
      .map(x => (x._1, x._3, x._2)).sortBy(x => (x._1, x._2))
    val fusedTop = got.map(x => (x._1, x._2, x._3))
    assert(fusedTop != denseTop && fusedTop != lexTop,
      "fusion must blend evidence, not echo one ranker")
  }

  test("RAG serve split (q231): store-backed serve == one-shot q223 retrieval") {
    val t = graft.Tables(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val served = rows(Similarity.ragServeFrom(spark, t.documents,
      t.embeddings))
    val oneShot = rows(Similarity.ragRetrievalFrom(spark, t.documents,
      t.embeddings))
    assert(served.nonEmpty && served == oneShot,
      "serving from the persisted store must equal the one-shot chain")
  }

  test("retrieval-quality gate (q232): recall@5 readout for dense/lexical/fused") {
    val t = graft.Tables(spark, sf)
    val got = Similarity.retrievalEvalFrom(spark, t.documents, t.embeddings)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val d = Similarity.RetrievalEvalDepth.toLong
    got.foreach { r =>
      assert(r._2 >= 0 && r._2 <= d && r._3 >= 0 && r._3 <= d
        && r._4 >= 0 && r._4 <= d, s"recall out of range: $r")
    }
    val n = got.length.toDouble * d
    val (dm, lm, fm) =
      (got.map(_._2).sum / n, got.map(_._3).sum / n, got.map(_._4).sum / n)
    info(f"recall@5 — dense $dm%.3f, lexical $lm%.3f, fused $fm%.3f " +
      s"(${got.length} queries)")
    // the truth set is embedding-similarity by construction, so the
    // dense ranker (an approximation of exactly that metric) must not
    // lose to the text-only ranker on aggregate
    assert(got.map(_._2).sum >= got.map(_._3).sum,
      "dense recall must be >= lexical recall on embedding truth")
  }

  test("lexical-truth gate (q240): the regime flips — lexical beats dense on text-overlap truth") {
    val t = graft.Tables(spark, sf)
    val got = Similarity
      .retrievalEvalLexFrom(spark, t.documents, t.embeddings).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val d = Similarity.RetrievalEvalDepth.toLong
    got.foreach { r =>
      assert(r._2 >= 0 && r._2 <= d && r._3 >= 0 && r._3 <= d
        && r._4 >= 0 && r._4 <= d, s"recall out of range: $r")
    }
    val n = got.length.toDouble * d
    info(f"lexical-truth recall@5 — dense ${got.map(_._2).sum / n}%.3f, " +
      f"lexical ${got.map(_._3).sum / n}%.3f, " +
      f"fused ${got.map(_._4).sum / n}%.3f (${got.length} queries)")
    // the truth is text overlap, which the hash-borrowed fixture
    // embeddings cannot see — the q232 regime must FLIP
    assert(got.map(_._3).sum > got.map(_._2).sum,
      "lexical recall must beat dense recall on lexical truth")
  }

  test("MRL prefix gate (q241): matches an in-JVM replay; longer prefix never ranks worse in aggregate") {
    val emb = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val got = Similarity.mrlPrefixRecallFrom(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    val eq = emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(x * 1e6) AS BIGINT))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d(a: Long, b: Long, dims: Int): Long =
      (0 until dims).map { i =>
        val x = eq(a)(i) - eq(b)(i); x * x
      }.sum
    def top3(q: Long, dims: Int): Seq[Long] =
      eq.keys.filter(_ != q).toSeq
        .sortBy(n => (d(q, n, dims), n)).take(3)
    val want = eq.keys.filter(_ % 50 == 0).toSeq.sorted.map { q =>
      val truth = top3(q, 64).toSet
      (q, top3(q, Similarity.MrlPrefixA).count(truth),
        top3(q, Similarity.MrlPrefixB).count(truth))
    }
    assert(got.map(x => (x._1, x._2.toInt, x._3.toInt)) ==
      want.map(x => (x._1, x._2, x._3)),
      "gate must replay the exact prefix/full rankings")
    assert(got.map(_._3).sum >= got.map(_._2).sum,
      "a longer prefix must not rank worse in aggregate")
    val n = got.length * 3.0
    info(f"prefix recall@3 — p16 ${got.map(_._2).sum / n}%.3f, " +
      f"p32 ${got.map(_._3).sum / n}%.3f (${got.length} queries)")
  }

  test("MRL truncate-before-training (q244): prefix index retains recall at 4x fewer reads") {
    val emb = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val out = Similarity.mrlPrefixIvfAdcFrom(emb).collect()
    assert(out.nonEmpty)
    val fullSum = out.map(_.getLong(1)).sum
    val prefSum = out.map(_.getLong(2)).sum
    val readsF = out.map(_.getLong(3)).sum.toDouble
    val readsP = out.map(_.getLong(4)).sum.toDouble
    info(f"r3 full=${fullSum} prefix=${prefSum} over ${out.length} " +
      f"queries; LUT-read ratio ${readsF / readsP}%.2f")
    // the deployment claim: the prefix-trained index pays ~1/4 the LUT
    // reads (1 sub-space vs 4; cell populations differ slightly so the
    // ratio is near, not exactly, 4)...
    assert(readsF / readsP > 3.5 && readsF / readsP < 4.5,
      f"read-mass ratio must sit at the sub-space ratio: ${readsF / readsP}%.2f")
    // ...while RETAINING recall on a corpus whose prefixes carry the
    // structure (the planted matryoshka property): at least half the
    // full index's hits, and a real reading (not zero)
    assert(prefSum > 0, "prefix index must retrieve true neighbors")
    assert(prefSum * 2 >= fullSum,
      s"prefix recall must track the full index on an MRL corpus: " +
        s"prefix $prefSum vs full $fullSum")
    // the plant's same-cluster cancellation: two vectors of one
    // planted cluster keep their ORIGINAL prefix distance (offsets
    // cancel), so the planted corpus cannot degenerate to one point
    val pl = Similarity.mrlPlanted(emb)
      .filter(col("vec_id").isin(0L, Similarity.MrlPlantClusters))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val or = emb.filter(col("vec_id").isin(0L, Similarity.MrlPlantClusters))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val k = Similarity.MrlPlantClusters
    val dPlant = (0 until Similarity.MrlPrefixA)
      .map(i => pl(0L)(i) - pl(k)(i)).map(x => x * x).sum
    val dOrig = (0 until Similarity.MrlPrefixA)
      .map(i => or(0L)(i).toDouble - or(k)(i).toDouble)
      .map(x => x * x).sum
    assert(math.abs(dPlant - dOrig) < 1e-9,
      "same-cluster prefix offsets must cancel exactly")
  }

  test("MRL finer prefix quantizer (q247): 2x8-dim sub-spaces lift recall; reads double, still half of full") {
    val emb = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val one = Similarity.mrlPrefixIvfAdcFrom(emb).collect()
    val two = Similarity.mrlPrefixIvfAdc2From(emb).collect()
    val r1 = one.map(_.getLong(2)).sum            // M=1 prefix hits
    val rf = one.map(_.getLong(1)).sum            // full-index hits
    val r2 = two.map(_.getLong(1)).sum            // M=2 prefix hits
    val reads1 = one.map(_.getLong(4)).sum.toDouble
    val reads2 = two.map(_.getLong(2)).sum.toDouble
    val readsF = one.map(_.getLong(3)).sum.toDouble
    info(s"r3: full=$rf prefix(M=1)=$r1 prefix(M=2)=$r2; " +
      f"reads M2/M1=${reads2 / reads1}%.2f M2/full=${reads2 / readsF}%.2f")
    // same corpus, same truth, same stored 16-dim prefix — the finer
    // sub-quantization must not rank worse, and here it resolves the
    // near-ties the single 16-dim sub-space collapses
    assert(r2 >= r1,
      s"finer sub-quantization must not lose recall: M=2 $r2 vs M=1 $r1")
    // read mass: exactly 2 LUT lookups per candidate vs 1 (same probed
    // cells — the coarse quantizer is shared), still half of full's 4
    assert(math.abs(reads2 / reads1 - 2.0) < 1e-9,
      f"M=2 must pay exactly 2x the M=1 lookups: ${reads2 / reads1}%.3f")
    assert(reads2 / readsF < 0.55,
      f"M=2 prefix must stay near half the full index's reads: ${reads2 / readsF}%.3f")
  }

  test("pipeline with LM gate (q242): a strict sub-mixture of q121 — the tail drop bites") {
    import graft.operators.CorpusOps
    def mix(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val base = mix(CorpusOps.fullPipeline(spark, sf))
    val gated = mix(CorpusOps.fullPipelineLm(spark, sf))
    assert(gated.nonEmpty)
    gated.foreach { case (k, (nd, st, sq)) =>
      val (bnd, bst, bsq) = base(k)
      assert(nd <= bnd && st <= bst && sq <= bsq,
        s"group $k grew under an extra gate")
    }
    assert(gated.values.map(_._1).sum < base.values.map(_._1).sum,
      "the LM tail-drop must remove at least one q121 survivor")
  }

  test("RAG MMR (q224): matches an in-JVM greedy replay; diversifies vs plain top-k") {
    val t = graft.Tables(spark, sf)
    val cv = Similarity.chunkVectors(t.documents, t.embeddings)
      .persist()
    val got = Similarity
      .ragRetrievalMmrFrom(spark, t.documents, t.embeddings).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2) * 1048576L + r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // independent replay: same candidate pool, greedy MMR in plain Scala
    val cand = Similarity
      .ivfAdcRerankTopKFrom(cv, topK = Similarity.MmrShortlist).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val eq = cv.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(x * 1e6) AS BIGINT))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = cand.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      val pool = cs.map(c => (c._2, c._3)).sortBy(identity)
      val sel = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      for (rk <- 1 to Similarity.MmrSelect
           if sel.length < pool.length) {
        val pick = pool.filterNot(c => sel.exists(_._3 == c._1))
          .map { case (n, dq) =>
            val score = if (rk == 1) dq
              else dq - sel.map(s => d(eq(n), eq(s._3))).min
            (score, n, dq)
          }.minBy(x => (x._1, x._2))
        sel += ((q, rk.toLong, pick._2, pick._3))
      }
      sel
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq.sortBy(x => (x._1, x._2)) == want,
      "served MMR selection must replay the greedy rule exactly")
    // diversification: summed min-intra-set distance of the MMR top-3
    // strictly dominates the plain exact top-3's on this fixture (the
    // 50%-overlap chunks make redundant neighbors common)
    def intraDiv(sets: Map[Long, Seq[Long]]): Long =
      sets.values.map { ns =>
        if (ns.length < 2) 0L
        else ns.map(n => ns.filter(_ != n)
          .map(m => d(eq(n), eq(m))).min).sum
      }.sum
    val mmrSets = got.groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._3).toSeq }
    val plainSets = Similarity.ivfAdcRerankTopKFrom(cv, topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSeq }
    val (dm, dp) = (intraDiv(mmrSets), intraDiv(plainSets))
    assert(dm > dp, s"MMR must diversify the served set: mmr=$dm plain=$dp")
    cv.unpersist()
  }

  test("LM quality buckets (q235): hand-computed smoothed quanta; junk lands in the tail") {
    import spark.implicits._
    // reference slice = doc_id % 5 == 0: doc 0 "r s r s r" only.
    // Model: cb(r,s)=2, cb(s,r)=2, cp(r)=2, cp(s)=2, V=|{r,s}|=2.
    val docs = Seq(
      (0L, "r s r s r"),  // the reference doc scores itself: seen pairs
      (1L, "r s"),        // seen pair — ties doc 0's mean
      (2L, "r r"),        // seen prefix, UNSEEN pair — smoothing floor
      (3L, "x y"),        // unseen prefix — pure V/1 fallback
      (4L, "z")           // no bigrams — no row
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.lmQualityBucketsFrom(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def q(cp: Long, cb: Long) =
      math.floor(math.log((cp + 2.0) / (cb + 1)) * 1e4).toLong
    val seen = q(2, 2)   // ln(4/3): both (r,s) and (s,r)
    assert(out(0L) == ((4L, 4 * seen, seen, 1L)))
    assert(out(1L) == ((1L, seen, seen, 1L)))
    assert(out(3L) == ((1L, q(0, 0), q(0, 0), 2L)))  // ln(2)
    assert(out(2L) == ((1L, q(2, 0), q(2, 0), 3L)))  // ln(4) — worst
    assert(!out.contains(4L), "a 1-token doc has no bigrams and no row")
    // ntile(3) of 4 rows = sizes 2/1/1 in (mean, doc_id) order —
    // asserted above via the bucket components; and the bucket means
    // must be monotone
    assert(out(0L)._3 <= out(3L)._3 && out(3L)._3 <= out(2L)._3)
    // the real corpus: buckets partition per the SQL ntile formula and
    // scores never decrease across bucket boundaries
    val real = graft.operators.TextAnalysis
      .lmQualityBucketsFrom(graft.Tables(spark, sf).documents)
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    val n = real.length.toLong
    val sizes = real.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    (1L to 3L).foreach { b =>
      val want = n / 3 + (if (b <= n % 3) 1L else 0L)
      assert(sizes.getOrElse(b, 0L) == want,
        s"bucket $b size ${sizes.getOrElse(b, 0L)} != ntile's $want")
    }
    assert(real.filter(_._2 == 1L).map(_._1).max
        <= real.filter(_._2 == 3L).map(_._1).min,
      "head scores must not exceed tail scores")
  }

  test("hard negatives (q236): shortlist minus exact positives, exact-distance order") {
    val emb = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding"))
    val mined = Similarity.hardNegativesFrom(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(mined.nonEmpty)
    // in-JVM exact model over the quantized vectors
    val eq = emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(x * 1e6) AS BIGINT))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d(a: Long, b: Long): Long =
      eq(a).zip(eq(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    val queries = eq.keys.filter(_ % 50 == 0).toSeq
    val positives = queries.map { qid =>
      qid -> eq.keys.filter(_ != qid).toSeq
        .sortBy(n => (d(qid, n), n)).take(Similarity.HardNegPositives).toSet
    }.toMap
    val pool = Similarity
      .ivfAdcRerankTopKFrom(emb, topK = Similarity.RerankShortlist)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // mined == (pool minus positives), re-ranked by exact distance,
    // cut at HardNegK — replayed in plain Scala
    val want = pool.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
      cs.filterNot(c => positives(qid)(c._2))
        .sortBy(c => (c._3, c._2)).take(Similarity.HardNegK)
        .zipWithIndex.map { case (c, i) => (qid, i + 1L, c._2, c._3) }
    }.sortBy(x => (x._1, x._2))
    assert(mined.toSeq.sortBy(x => (x._1, x._2)) == want,
      "mining must serve the nearest non-positive shortlist members")
    mined.foreach { m =>
      assert(!positives(m._1)(m._3),
        s"query ${m._1}: mined negative ${m._3} is an exact positive")
      assert(m._4 == d(m._1, m._3), "exact_dist must be the integer L2")
    }
  }

  test("audio segments (q238): hand-built energy profile cuts exact active runs") {
    import spark.implicits._
    // 7 frames of 64 samples (128 chars) each: Q L L Q Q L Q.
    // quiet sample = 'a'+256·'a' = 24929, loud = 'z'+256·'z' = 31354;
    // dc = (4·24929 + 3·31354) // 7 = 27682; quiet frame energy =
    // 64·(24929−27682)² = 485056576, loud = 64·(31354−27682)² =
    // 862949376; mean_e = (4·485056576 + 3·862949376) // 7 = 647010633
    // → loud frames 1,2,5 active → segments [1,2] and [5,5].
    val q = "a" * 128; val l = "z" * 128
    val docs = Seq(
      (1L, q + l + l + q + q + l + q),
      (2L, q * 4),          // constant tone: no frame above its mean
      (3L, "a" * 100)       // under one frame — filtered out
    ).toDF("doc_id", "text")
    val got = graft.operators.Multimodal.audioSegmentsFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val le = 862949376L
    assert(got == Seq(
      (1L, 1L, 1L, 2L, 2L, 2 * le),
      (1L, 2L, 5L, 5L, 1L, le)),
      s"segments diverged: $got")
  }

  test("length batching (q239): exact layout on a constructed corpus; invariants on the real one") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // lengths 1..10 share class 0: batch 0 = the 8 shortest (max 8,
    // mass 36, padding 28), batch 1 = lens 9,10 (padding 1); len 33
    // opens class 1 alone (padding 0)
    val docs = ((1 to 10).map(n =>
        (n.toLong, Seq.fill(n)("w").mkString(" ")))
      :+ (11L, Seq.fill(33)("w").mkString(" "))).toDF("doc_id", "text")
    val got = CorpusOps.lengthBatchingFrom(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq((0L, 0L, 8L, 8L, 36L, 28L),
      (0L, 1L, 2L, 10L, 19L, 1L), (1L, 0L, 1L, 33L, 33L, 0L)),
      s"layout diverged: $got")
    // real corpus: every batch is full except each class's last; token
    // mass is conserved; padding per batch stays under n·classWidth
    // (batch members share a 32-wide length class)
    val t = graft.Tables(spark, sf).documents
    val real = CorpusOps.lengthBatchingFrom(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(real.nonEmpty)
    val totalToks = t.select(size(split(col("text"), " "))
        .cast("long").as("l"))
      .agg(sum(col("l"))).head().getLong(0)
    assert(real.map(_._5).sum == totalToks, "token mass must be conserved")
    real.groupBy(_._1).foreach { case (lb, bs) =>
      val lastIdx = bs.map(_._2).max
      bs.foreach { b =>
        assert(b._2 == lastIdx || b._3 == CorpusOps.BatchSeqs,
          s"non-final batch not full: $b")
        assert(b._6 >= 0 && b._6 < b._3 * CorpusOps.LenBucketWidth,
          s"padding out of the class-width envelope: $b")
      }
    }
  }
}
