package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Dense-array group-by count as a typed `Aggregator` — direct parity with
  * the reference's per-thread 256-slot array specialization
  * (`groupby_array_regtest.cpp:30-68`): when the key domain is provably
  * small and dense, counting into a flat array beats a hash map. Spark's
  * partial/final aggregation calls `reduce` per row on each partition and
  * `merge` across partitions — exactly the per-thread-array + final-merge
  * shape the reference hand-codes with OpenMP.
  *
  * Guard: only safe for provably bounded key domains (SURVEY §7 "what's
  * hard") — out-of-range keys land in an overflow slot rather than growing
  * the array.
  */
class DenseCounter(domain: Int) extends Aggregator[Int, Array[Long], Seq[Long]]
    with Serializable {
  override def zero: Array[Long] = new Array[Long](domain + 1) // +1 overflow
  override def reduce(buf: Array[Long], key: Int): Array[Long] = {
    val slot = if (key >= 0 && key < domain) key else domain
    buf(slot) += 1L
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
