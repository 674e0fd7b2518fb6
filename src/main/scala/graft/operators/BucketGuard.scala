package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucket-size guard for LSH candidate generation (minhash bands, simhash
  * bands, embedding projection buckets).
  *
  * A bucket holding B rows emits O(B²) candidate pairs from the self-join,
  * so one degenerate bucket — a band value shared by a large fraction of
  * the corpus (mass-duplicated boilerplate, all-zero embeddings, a hash
  * pathology) — goes quadratic no matter how good the banding is. The
  * guard excludes buckets larger than `cap` from candidate generation and
  * REPORTS their mass in the funnel summary (never a silent drop): capped
  * pairs remain discoverable through the other bands/tables, and the
  * reported mass tells the pipeline operator to escalate (sample the
  * bucket, add bands, or exact-dedup the boilerplate first). Worst-case
  * candidate count per bucket is bounded at cap²/2.
  */
private[operators] object BucketGuard {

  /** Splits `rows` into (kept rows, 1-row skipped-mass summary
    * `(n_skipped_buckets, n_skipped_rows)`) by the size of the bucket
    * identified by `keys`. The size derivation is a window count over the
    * bucket key — the same hash-partitioning the downstream self-join
    * shuffles on, so the guard introduces no new shuffle class. */
  def apply(rows: DataFrame, keys: Seq[String], cap: Int): (DataFrame, DataFrame) = {
    val sized = rows.withColumn("_bsz",
      count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
    val kept = sized.filter(col("_bsz") <= cap).drop("_bsz")
    val skipped = sized.filter(col("_bsz") > cap)
      .agg(
        count_distinct(struct(keys.map(col): _*)).as("n_skipped_buckets"),
        count(lit(1)).as("n_skipped_rows"))
    (kept, skipped)
  }
}
