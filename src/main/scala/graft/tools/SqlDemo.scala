package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev driver: exercises the SQL-registration surface and the custom
  * sessionizer from a plain program (the way a library user would). */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.bridge.registerFunctions(spark)
    Tables(spark, dir).documents.createOrReplaceTempView("documents")
    println("[sqldemo] SQL with custom functions:")
    spark.sql(
      """SELECT doc_id, poly_hash(text, 0) AS fp,
        |       simhash64(split(lower(text), ' ')) AS simhash
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin).show(false)
    println("[sqldemo] minhash_sig as SQL aggregate:")
    spark.sql(
      """SELECT lang, size(minhash_sig(substring(text, 1, 8))) AS sig_len
        |FROM documents GROUP BY lang ORDER BY lang LIMIT 3""".stripMargin).show(false)
    spark.stop()
  }
}
