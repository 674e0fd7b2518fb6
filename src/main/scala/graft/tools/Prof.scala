package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling: stage-by-stage timing of the minhash pipeline. */
object Prof {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, dir).documents
    time("docs.count")(docs.count())
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(col("text"), 8)).as("sh"))
    time("shingle explode count")(sh.count())
    time("shingle explode count (2nd)")(sh.count())
    val sigs = sh.groupBy(col("doc_id"))
      .agg(graft.functions.MinHashSig.minhash_sig(col("sh"), 64).as("sig"))
    time("signatures count")(sigs.count())
    time("signatures count (2nd)")(sigs.count())
    val full = time("minhashLshSummary construct")(
      graft.operators.Dedup.minhashLshSummary(spark, dir))
    time("minhashLshSummary collect")(full.collect())
    spark.stop()
  }
}
