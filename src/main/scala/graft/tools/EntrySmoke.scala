package graft.tools
import org.apache.spark.sql.SparkSession
/** Driver-contract smoke: SparkEntry.entry must return rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry] rows=$n")
    assert(n > 0)
    spark.stop()
  }
}
