package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev: full (cold, per-call) cost of the two BFS implementations. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm JVM on small sf
    graft.operators.GraphOps.bfs(spark, "/root/testdata/sf0.001").count()
    graft.operators.GraphOps.bfsFrontier(spark, "/root/testdata/sf0.001").count()
    for (i <- 1 to 2) {
      var t0 = System.nanoTime()
      graft.operators.GraphOps.bfs(spark, dir).count()
      println(f"[prof] pregel_bfs full: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      graft.operators.GraphOps.bfsFrontier(spark, dir).count()
      println(f"[prof] frontier_bfs full: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
