package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: codegen WinnowFps vs the staged higher-order
  * formulation on the same corpus (median of 3 passes each). */
object WinnowBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[winnow] $label: median ${ts.map(_._1).sorted.apply(1)}%.2f s (${ts.head._2} fps)")
    }
    time("codegen")(graft.operators.Dedup.winnowFingerprintSetsFrom(docs)
      .agg(sum(size(col("fps")))).head().getLong(0))
    time("hof_staged")(graft.operators.Dedup.winnowFingerprintSetsHofFrom(docs)
      .agg(sum(size(col("fps")))).head().getLong(0))
    spark.stop()
  }
}
