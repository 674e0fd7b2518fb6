package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quick ANN operating-point probe: mean recall@3 of the IVFADC tier
  * (q159/q179 composition) across nprobe, on one fixture dir — the
  * focused sibling of ScaleSmoke's full sweep, for iterating on the
  * index (codebook rule changes, residual encoding, training rungs)
  * without paying the whole battery. Usage:
  * `runMain graft.tools.RecallProbe /root/testdata/sf0.01` */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fx = graft.Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    val pqI = graft.operators.Similarity.PqTrainIters
    val kcI = graft.operators.Similarity.IvfCoarseIters
    Seq(1, 2, 4, 8).foreach { np =>
      val t0 = System.nanoTime()
      val m = graft.operators.Similarity
        .ivfAdcRecallEvalFrom(fx, nprobe = np, trainIters = pqI,
          coarseIters = kcI)
        .agg(avg(col("recall3"))).head().getDouble(0)
      println(f"[probe] nprobe=$np mean_recall3=$m%.3f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    // re-rank at the registered operating point: recall of the q198
    // exact-re-ranked top-3 vs the exact integer-L2 top-3 (the q179
    // truth side), computed in the JVM
    val eqm = fx.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(x * 1e6) AS BIGINT))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact3 = eqm.keys.filter(_ % 50 == 0).flatMap { q =>
      eqm.keys.filter(_ != q).toSeq
        .map(n => (n, d(eqm(q), eqm(n))))
        .sortBy { case (n, dist) => (dist, n) }
        .take(3).map(n => (q, n._1))
    }.toSet
    val rr = graft.operators.Similarity.ivfAdcRerankTopKFrom(fx)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val nq = eqm.keys.count(_ % 50 == 0).max(1)
    println(f"[probe] re-ranked nprobe=4 mean_recall3=" +
      f"${rr.count(exact3).toDouble / nq}%.3f " +
      f"(hits=${rr.count(exact3)} of ${3 * nq})")
    spark.stop()
  }
}
