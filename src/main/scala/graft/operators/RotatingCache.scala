package graft.operators

import org.apache.spark.sql.DataFrame

/** Keeps at most one persisted DataFrame per slot: multi-branch funnels
  * persist an intermediate scan, and without eviction a session sweeping
  * several scale dirs accumulates caches. Eviction is plan-aware — an
  * identical analyzed plan shares one CacheManager entry, and repeated
  * runs (bench warmup + timed pass) must keep reusing it, so only an
  * actually-changed input evicts. A lazily-returned result may still
  * reference an evicted frame; unpersist just falls back to recompute,
  * results unchanged.
  *
  * Caveat (shared with Spark's own CacheManager): plan equality compares
  * source paths, not file contents — rewriting a parquet dir in-place
  * within one session would serve the stale cache. Fixture dirs here are
  * immutable.
  */
private[operators] final class RotatingCache {
  private var last: Option[DataFrame] = None

  /** `df` must already be `.persist()`-ed by the caller. */
  def rotate(df: DataFrame): DataFrame = synchronized {
    last
      .filter(!_.queryExecution.analyzed.sameResult(df.queryExecution.analyzed))
      .foreach(_.unpersist())
    last = Some(df)
    df
  }
}
