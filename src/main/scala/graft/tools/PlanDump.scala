package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print `explain("formatted")` for selected registered
  * queries, in the PLANS.md section format. Usage:
  * `runMain graft.tools.PlanDump <sfDir> <name-substring>[,more]` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pats = args.lift(1).getOrElse("").split(",").filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries
      .filter(kv => pats.isEmpty || pats.exists(kv._1.contains))
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n================ $name ================")
        fn(spark, dir).explain("formatted")
      }
    spark.stop()
  }
}
