package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md §B).
  *
  * Every read goes through Spark's vectorized Parquet reader, which is the
  * idiomatic replacement for the reference's paged sequential scan
  * (reference: `src/regtests/scan_regtest.cpp:28-34`): row groups play the
  * role of 64 KB pages, and Catalyst pushes filters + column pruning into
  * the scan, so downstream operators never see bytes they don't need.
  *
  * At cluster scale the same code reads a partitioned table from a
  * distributed FS; nothing here assumes local mode.
  *
  * Tables are `lazy val`s so that join conditions written against column
  * references from this object resolve to the same logical relation.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  lazy val region: DataFrame     = t("region")
  lazy val nation: DataFrame     = t("nation")
  lazy val customer: DataFrame   = t("customer")
  lazy val supplier: DataFrame   = t("supplier")
  lazy val part: DataFrame       = t("part")
  lazy val orders: DataFrame     = t("orders")
  lazy val lineitem: DataFrame   = t("lineitem")
  lazy val documents: DataFrame  = t("documents")
  lazy val embeddings: DataFrame = t("embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (microseconds) cannot represent exactly. How the reader surfaces it
    * depends on the Spark version, so we dispatch on the observed schema:
    *
    *  - Spark ≤4.0 only admits it as a raw nanosecond Long under the
    *    `nanosAsLong` legacy conf → truncate to micros via `ts div 1000`.
    *  - Spark 4.1+ reads it natively as TIMESTAMP_NTZ (already truncated
    *    to micros) → cast to TimestampType. The session TZ is pinned UTC,
    *    so the NTZ wall-clock reinterpretation is byte-identical to the
    *    naive TIMESTAMP the DuckDB oracles compare against.
    *
    * All engine queries bucket at ≥1-second granularity, so the micro
    * truncation is semantics-free either way.
    */
  lazy val events: DataFrame = {
    // Best-effort: the legacy conf may not exist on newer Spark versions.
    scala.util.Try(spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"))
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
