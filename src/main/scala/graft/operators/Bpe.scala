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
  * Scale shape: one corpus aggregate (word counts), then R vocabulary-
  * scale rounds (aggregate + 1-row collect — the Lloyd loop shape), a
  * broadcast of the ≤vocab (word → n_tokens) relation back onto the
  * corpus scan, and one per-doc aggregate. Nothing after the first
  * aggregate touches corpus-scale data, so 100 TB costs two corpus
  * passes total. Training is cached per corpus snapshot
  * ([[TrainedCache]], the train-once-freeze posture). */
object Bpe {

  /** Registered merge rounds — mirrored in the oracle's CTE unroll
    * (SparkEntry generates p1..pN/b1..bN/s1..sN from this constant);
    * keep the two in sync. */
  private[graft] val BpeMerges = 8

  private val S1 = "\u0001"
  private val S2 = "\u0002"

  private val mergeCache = new TrainedCache[Seq[(String, String, Long)]]

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

  /** Train the merge table: `rounds` × (pair-count aggregate over the
    * vocabulary → deterministic top-1 → one replace). Stops early if a
    * round finds no pair (every word fully merged) — the oracle's
    * LIMIT-1-empty blocks mirror the early stop. Returns
    * (pa, pb, count) in merge order. */
  private[graft] def trainMerges(wc: DataFrame,
      rounds: Int): Seq[(String, String, Long)] = {
    var cur = wc.select(col("w"), col("cnt"), wrapped(col("w")).as("s"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to rounds if !done) {
      val arr = symbols(col("s"))
      // Spark's sequence(1, 0) DESCENDS instead of being empty — guard
      // fully-merged single-symbol words out of the pair explosion
      val idx = when(size(arr) > 1, sequence(lit(1), size(arr) - 1))
        .otherwise(array().cast("array<int>"))
      val best = cur
        .select(col("cnt"), explode(transform(idx,
          i => struct(element_at(arr, i).as("pa"),
            element_at(arr, i + 1).as("pb")))).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("cnt")).as("n"))
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

  /** Trained merge table (q209): one row per learned merge —
    * (merge_rank, pa, pb, pair count at selection time). The direct
    * readout of the training loop, hash-comparable against the
    * oracle's unrolled replay. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergesFrom(spark, graft.Tables(spark, dir).documents)

  private[graft] def bpeMergesFrom(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    val wc = wordCounts(docs)
    val merges = mergeCache.getOrTrain(wc, Seq(BpeMerges))(
      trainMerges(wc, BpeMerges))
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
    val wc = wordCounts(docs)
    val merges = mergeCache.getOrTrain(wc, Seq(BpeMerges))(
      trainMerges(wc, BpeMerges))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(wordTokens(wc, merges.map(m => (m._1, m._2)))),
        Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws_tokens"),
        sum(coalesce(col("n_tok"), lit(1L))).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** ENCODE under a GIVEN (frozen) merge table: per vocabulary word,
    * the BPE token count after applying the merges in order — the step
    * the streaming drift monitor (q216) runs against a tokenizer
    * trained on an earlier snapshot. Words outside the training vocab
    * encode fine (merges are string rules, not a lookup). */
  private[graft] def wordTokens(vocab: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val enc = merges.foldLeft(wrapped(col("w"))) {
      case (s, (pa, pb)) =>
        call_function("replace", s,
          lit(S1 + pa + S2 + S1 + pb + S2), lit(S1 + pa + pb + S2))
    }
    vocab.select(col("w"), size(symbols(enc)).cast("long").as("n_tok"))
  }
}
