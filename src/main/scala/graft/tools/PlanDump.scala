package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints `explain("formatted")` for registered queries — the source of
  * the PLANS.md records. Usage: PlanDump <sfDir> <name-substring>[,more]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val pats = args.lift(1).getOrElse("").split(",").filter(_.nonEmpty)
    // SPARK_GRAFT_AQE=0: with AQE on, explain() of the initial plan
    // carries no WholeStageCodegen spans (AQE inserts them per stage at
    // execution) — dump with AQE off when the evidence wanted is the
    // codegen-span shape rather than the adaptive plan.
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled",
        (sys.env.getOrElse("SPARK_GRAFT_AQE", "1") == "1").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries
      .filter(kv => pats.isEmpty || pats.exists(kv._1.contains))
      .toSeq.sortBy(_._1).foreach { case (name, fn) =>
        println(s"================ $name ================")
        fn(spark, dir).explain("formatted")
      }
    spark.stop()
  }
}
