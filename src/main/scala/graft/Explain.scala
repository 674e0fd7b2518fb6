package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally steady-state
  * timings) for selected queries. Usage:
  *   runMain graft.Explain [sfDir] [query...]        — plans
  *   SPARK_GRAFT_TIME=3 runMain graft.Explain ...    — + N timed repeats
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
                else SparkEntry.benchQueries
    val repeats = sys.env.getOrElse("SPARK_GRAFT_TIME", "0").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"\n================ $name ================")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      if (repeats > 0) {
        df.count() // warm
        val times = (1 to repeats).map { _ =>
          val t0 = System.nanoTime()
          df.count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[time] $name min=${times.min}%.3f s median=${times.sorted.apply(times.size / 2)}%.3f s")
      }
    }
    spark.stop()
  }
}
