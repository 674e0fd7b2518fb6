package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer rung (q209 merge table, q210 token
  * accounting) — the tokenizer-aware sibling of the whitespace token
  * counts every budget/quota operator (q111/q113/q145/q166/q182) runs
  * on: real LLM token budgets are BPE tokens, and the whitespace-vs-BPE
  * mass ratio is the correction factor a budget planner needs.
  *
  * TRAINING (the Sennrich et al. formulation): BPE trains on the
  * distinct-WORD frequency table, not the corpus — `wordCounts` is one
  * corpus aggregate, and every Lloyd-style merge round after it runs on
  * the vocabulary relation (metadata next to the corpus, the q142
  * posture: per round one aggregate + one driver-side top-1 collect).
  * Each round counts adjacent symbol pairs weighted by word frequency
  * (overlapping positions counted, the standard rule), picks the most
  * frequent pair with a DETERMINISTIC tie-break (count desc, then
  * lexicographic (pa, pb)), and merges it greedily left-to-right
  * non-overlapping in every word.
  *
  * DETERMINISM — the merge-application trick: a word's symbol sequence
  * is carried as a single string with each symbol wrapped in U+0001 /
  * U+0002 sentinels (writing them ⟨ ⟩ here: the sequence [ab, c] is
  * "⟨ab⟩⟨c⟩"). Applying merge (pa, pb) is then ONE literal
  * `replace(s, "⟨pa⟩⟨pb⟩", "⟨papb⟩")` — replace-all is
  * left-to-right non-overlapping in both Spark and DuckDB, which IS
  * BPE's greedy merge rule, and the sentinels make cross-symbol
  * matches impossible. Both engines run literally the same string
  * algorithm, so the trained table and every token count replay
  * bit-exactly (the oracle unrolls the rounds as CTE blocks generated
  * from the same [[BpeMerges]] constant).
  *
  * ASCII gate (the q201 byte-transparency rule): only words with
  * octet_length = length train and encode — the sentinel chars cannot
  * occur in them, and per-code-point slicing agrees between engines.
  * Non-ASCII words count as ONE token (atomic), mirrored in the oracle.
  *
  * Scale shape: one corpus aggregate (word counts, persisted for the
  * whole train+encode lifetime), then R INCREMENTAL rounds
  * ([[trainMergesDelta]]): the pair-count relation is maintained as a
  * running delta — a round subtracts the pair mass of only the words
  * containing the merged pair, rewrites only those words, and adds
  * their post-rewrite mass back, so round cost tracks AFFECTED-word
  * mass (for real vocabularies a vanishing fraction past the first few
  * merges), not the vocabulary. Lineage is cut per round
  * (localCheckpoint, the louvainMovePhase discipline). A broadcast of
  * the ≤vocab (word → n_tokens) relation back onto the corpus scan and
  * one per-doc aggregate finish the job: nothing after the first
  * aggregate touches corpus-scale data, so 100 TB costs two corpus
  * passes total. Training is cached per corpus snapshot
  * ([[TrainedCache]], the train-once-freeze posture).
  *
  * R envelope: [[BpeMerges]] = 8 is demo-scale; a production tokenizer
  * is R ≈ 30k. The training loop itself is R sequential vocabulary-
  * metadata jobs (delta rounds are cheap but still driver-coordinated
  * — ~R × round-trip latency, fine to ~10³, slow but correct beyond).
  * The HARD cliff is [[wordTokens]]'s encode: it folds the R merges
  * into an R-deep `replace` expression chain, and Catalyst's codegen /
  * analyzer walk that tree per round-trip — measured in ScaleSmoke,
  * R=64 is fine, R=256 visibly pays tree-walk cost, and R≈30k would
  * need the encode rewritten as a scala iteration over the broadcast
  * merge list inside one expression (a fold over a lit array), not an
  * expression chain. The registered R=8 stays well inside the exact
  * cross-engine replay envelope. */
object Bpe {

  /** Registered merge rounds — mirrored in the oracle's CTE unroll
    * (SparkEntry generates p1..pN/b1..bN/s1..sN from this constant);
    * keep the two in sync. */
  private[graft] val BpeMerges = 8

  private val S1 = "\u0001"
  private val S2 = "\u0002"

  private val mergeCache = new TrainedCache[Seq[(String, String, Long)]]

  /** The word-count relation backs both training and the encode join;
    * persisted for that whole lifetime (one slot — a changed corpus
    * evicts, repeated bench passes reuse). */
  private val wcCache = new RotatingCache

  /** Distinct ASCII words with corpus occurrence counts — the training
    * relation. */
  private[graft] def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "" && expr("octet_length(w) = length(w)"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Initial sentinel-wrapped symbol string: one wrapped symbol per
    * code point. */
  private def wrapped(w: Column): Column =
    concat_ws("", transform(sequence(lit(1), length(w)),
      i => concat(lit(S1), w.substr(i, lit(1)), lit(S2))))

  /** Symbol array from the wrapped string (strip outer sentinels,
    * split on the inter-symbol boundary). */
  private def symbols(s: Column): Column =
    split(s.substr(lit(2), length(s) - 2), S2 + S1)

  /** Frequency-weighted adjacent-pair counts of a (cnt, s) symbol-
    * string relation — the training aggregate. Overlapping positions
    * counted (the standard rule). */
  private def pairCounts(cur: DataFrame): DataFrame = {
    val arr = symbols(col("s"))
    // Spark's sequence(1, 0) DESCENDS instead of being empty — guard
    // fully-merged single-symbol words out of the pair explosion
    val idx = when(size(arr) > 1, sequence(lit(1), size(arr) - 1))
      .otherwise(array().cast("array<int>"))
    cur
      .select(col("cnt"), explode(transform(idx,
        i => struct(element_at(arr, i).as("pa"),
          element_at(arr, i + 1).as("pb")))).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(sum(col("cnt")).as("n"))
  }

  /** Train the merge table by FULL RECOUNT: `rounds` × (pair-count
    * aggregate over the whole vocabulary → deterministic top-1 → one
    * replace). Stops early if a round finds no pair (every word fully
    * merged) — the oracle's LIMIT-1-empty blocks mirror the early
    * stop. Returns (pa, pb, count) in merge order. This is the
    * textbook formulation the delta trainer is property-tested
    * against; the registered path runs [[trainMergesDelta]]. */
  private[graft] def trainMerges(wc: DataFrame,
      rounds: Int): Seq[(String, String, Long)] = {
    var cur = wc.select(col("w"), col("cnt"), wrapped(col("w")).as("s"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to rounds if !done) {
      val best = pairCounts(cur)
        .orderBy(col("n").desc, col("pa"), col("pb"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (pa, pb, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((pa, pb, n))
        cur = cur.select(col("w"), col("cnt"),
          call_function("replace", col("s"),
            lit(S1 + pa + S2 + S1 + pb + S2),
            lit(S1 + pa + pb + S2)).as("s"))
      }
    }
    merges.toSeq
  }

  /** Train the merge table INCREMENTALLY — same rule, same output,
    * bit-identical to [[trainMerges]] (PropertySpec pins the equality
    * on random corpora): the pair-count relation is carried across
    * rounds, and a round touches only the words whose symbol string
    * contains the merged pair. Per round:
    *   1. top-1 of the carried counts (deterministic tie-break);
    *   2. affected = words containing "⟨pa⟩⟨pb⟩" (one vocabulary
    *      filter scan — cheap `contains`, no pair explosion);
    *   3. counts −= affected's pre-rewrite pair mass,
    *      counts += affected's post-rewrite pair mass (aggregates over
    *      AFFECTED words only — for realistic vocabularies a vanishing
    *      fraction once the first merges specialize);
    *   4. vocabulary = untouched ∪ rewritten.
    * Zero-mass pairs are dropped so the carried relation never grows
    * past the live pair set. Both carried relations are
    * localCheckpoint'ed per round (eager, lineage cut — the
    * louvainMovePhase discipline), so nothing ever replays the raw
    * corpus: training reads the corpus exactly once, in wordCounts.
    * Exactness: integer adds/subtracts of exactly the mass that moved;
    * unaffected words' strings are byte-identical so their pair mass
    * cannot change. */
  private[graft] def trainMergesDelta(wc: DataFrame,
      rounds: Int): Seq[(String, String, Long)] = {
    var cur = wc.select(col("w"), col("cnt"), wrapped(col("w")).as("s"))
      .localCheckpoint(true)
    var pc = pairCounts(cur).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to rounds if !done) {
      val best = pc
        .orderBy(col("n").desc, col("pa"), col("pb"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (pa, pb, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((pa, pb, n))
        val pat = S1 + pa + S2 + S1 + pb + S2
        val affected = cur.filter(col("s").contains(pat))
        val rewritten = affected.select(col("w"), col("cnt"),
          call_function("replace", col("s"),
            lit(pat), lit(S1 + pa + pb + S2)).as("s"))
        pc = pc
          .unionByName(pairCounts(affected)
            .select(col("pa"), col("pb"), (-col("n")).as("n")))
          .unionByName(pairCounts(rewritten))
          .groupBy(col("pa"), col("pb")).agg(sum(col("n")).as("n"))
          .filter(col("n") > 0)
          .localCheckpoint(true)
        cur = cur.filter(!col("s").contains(pat))
          .unionByName(rewritten)
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Trained merge table (q209): one row per learned merge —
    * (merge_rank, pa, pb, pair count at selection time). The direct
    * readout of the training loop, hash-comparable against the
    * oracle's unrolled replay. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergesFrom(spark, graft.Tables(spark, dir).documents)

  private[graft] def bpeMergesFrom(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    val wc = wcCache.rotate(wordCounts(docs).persist())
    val merges = mergeCache.getOrTrain(wc, Seq(BpeMerges))(
      trainMergesDelta(wc, BpeMerges))
    merges.zipWithIndex
      .map { case ((pa, pb, n), i) => (i + 1L, pa, pb, n) }
      .toDF("merge_rank", "pa", "pb", "n")
      .orderBy(col("merge_rank"))
  }

  /** Whitespace-vs-BPE token accounting (q210): per document, the
    * whitespace token count every budget operator uses today and the
    * BPE token count under the trained merge table. The per-word token
    * counts come from applying the merges to the VOCABULARY once and
    * broadcasting (word → n_tok) back onto the corpus scan — the
    * encode pass never re-runs training. Non-ASCII words count 1. */
  def bpeTokenStats(spark: SparkSession, dir: String): DataFrame =
    bpeTokenStatsFrom(spark, graft.Tables(spark, dir).documents)

  private[graft] def bpeTokenStatsFrom(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    val wc = wcCache.rotate(wordCounts(docs).persist())
    val merges = mergeCache.getOrTrain(wc, Seq(BpeMerges))(
      trainMergesDelta(wc, BpeMerges))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(wordTokens(wc, merges.map(m => (m._1, m._2)))),
        Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws_tokens"),
        sum(coalesce(col("n_tok"), lit(1L))).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Merge-count ceiling for the expression-CHAIN encode: up to here
    * the R-deep replace chain stays cheap to analyze and fully
    * codegen'd (ScaleSmoke: flat to R=64, ~2× analyzer/codegen cost at
    * R=256, prohibitive toward a production R≈30k because Catalyst
    * walks the R-deep tree per analysis round-trip). Past it
    * [[wordTokens]] dispatches to [[wordTokensFold]] — same replaces,
    * same order, O(1) expression-tree size in R. */
  private[graft] val BpeEncodeChainMax = 64

  /** ENCODE under a GIVEN (frozen) merge table: per vocabulary word,
    * the BPE token count after applying the merges in order — the step
    * the streaming drift monitor (q216) runs against a tokenizer
    * trained on an earlier snapshot. Words outside the training vocab
    * encode fine (merges are string rules, not a lookup). Dispatches
    * on R: the replace-CHAIN expression for R ≤ [[BpeEncodeChainMax]]
    * (the registered R=8 path — also what the oracle unrolls), the
    * fold-over-literal-array form beyond (bit-identical; pinned by
    * BpeSpec at R=8 and property-tested on random corpora). */
  private[graft] def wordTokens(vocab: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    if (merges.lengthCompare(BpeEncodeChainMax) <= 0)
      wordTokensChain(vocab, merges)
    else wordTokensFold(vocab, merges)

  /** The R-deep replace-chain encode — one `replace` expression per
    * merge. Analyzer/codegen cost grows with R (each Catalyst pass
    * walks the whole chain), so this form is for small merge tables. */
  private[graft] def wordTokensChain(vocab: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = merges.foldLeft(wrapped(col("w"))) {
      case (s, (pa, pb)) =>
        call_function("replace", s,
          lit(S1 + pa + S2 + S1 + pb + S2), lit(S1 + pa + pb + S2))
    }
    vocab.select(col("w"), size(symbols(enc)).cast("long").as("n_tok"))
  }

  /** The production-R encode: the merge table as ONE array<struct>
    * Literal (a single Catalyst node holding R (pattern, replacement)
    * rows — not R expression nodes) folded over the symbol string with
    * `aggregate` (a single HigherOrderFunction). Expression-tree size
    * is O(1) in R, so analysis and codegen never see the merge count;
    * per-row work is the same R replaces the chain runs, in the same
    * order — BPE's greedy rule, bit-identical output. This is the
    * form a real R≈30k tokenizer ships with (ScaleSmoke measures the
    * chain cliff gone at R=1024). */
  private[graft] def wordTokensFold(vocab: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val mlit = typedlit(merges.map { case (pa, pb) =>
      (S1 + pa + S2 + S1 + pb + S2, S1 + pa + pb + S2)
    })
    val enc = aggregate(mlit, wrapped(col("w")), (acc, m) =>
      call_function("replace", acc, m.getField("_1"), m.getField("_2")))
    vocab.select(col("w"), size(symbols(enc)).cast("long").as("n_tok"))
  }
}
