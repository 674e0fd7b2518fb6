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
      .config("spark.sql.adaptive.enabled",
        (sys.env.getOrElse("SPARK_GRAFT_AQE", "1") == "1").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"\n================ $name ================")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      if (repeats > 0) {
        // Bench-identical measurement: rebuild the DataFrame each repeat
        // (eager operators like Pregel run during the build) and execute
        // the FULL plan via a noop write, not count().
        def once(): (Double, Double) = {
          val t0 = System.nanoTime()
          val d = SparkEntry.queries(name)(spark, sfDir)
          val t1 = System.nanoTime()
          d.write.format("noop").mode("overwrite").save()
          ((t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9)
        }
        once() // warm
        val times = (1 to repeats).map(_ => once())
        val tot = times.map(t => t._1 + t._2)
        println(f"[time] $name min=${tot.min}%.3f s median=${tot.sorted.apply(tot.size / 2)}%.3f s " +
          f"(build ${times.map(_._1).min}%.3f write ${times.map(_._2).min}%.3f)")
      }
    }
    spark.stop()
  }
}
