package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a custom `TypedImperativeAggregate` — the
  * dense-array aggregation specialization the reference demonstrates with
  * its 256-slot per-thread array group-by (`groupby_array_regtest.cpp:30-68`),
  * re-expressed as Spark's imperative-buffer UDAF surface (SURVEY §2.k).
  *
  * One mutable `Array[Long](n)` buffer per group replaces n separate
  * `min(hash_i(...))` aggregate expressions: a single string hash per input
  * row (seeded FNV-1a, shared with PolyHash) is stretched into the n-member
  * universal family h_i = a_i·h + b_i (Broder's construction), so the
  * per-row cost is one byte loop + n mul-adds. Partial buffers merge by
  * elementwise min — the same partial/final two-phase shape as every Spark
  * aggregate, so map-side combine keeps the shuffle at one row per
  * (group × partition).
  */
case class MinHashSig(
    child: Expression,
    numHashes: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // Hash-family parameters sized to numHashes (not a fixed 64-entry
  // table), so any signature width is valid; one lazy init per task.
  @transient private lazy val A: Array[Long] = MinHashSig.familyA(numHashes)
  @transient private lazy val B: Array[Long] = MinHashSig.familyB(numHashes)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = MinHashSig.fnv(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < numHashes) {
        // universal family: odd multiplier + increment from splitmix64(i)
        val h = A(i) * base + B(i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSig =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSig =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSig {
  /** Unseeded FNV-1a, identical byte loop to PolyHash(seed=0). */
  def fnv(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** Universal-family multipliers (odd) and increments, shared between the
    * aggregate and the DuckDB oracle SQL (SparkEntry inlines these as
    * literal arrays so the q42 replay uses the exact same family). */
  private[graft] def familyA(n: Int): Array[Long] =
    Array.tabulate(n)(i => splitmix(2L * i) | 1L)
  private[graft] def familyB(n: Int): Array[Long] =
    Array.tabulate(n)(i => splitmix(2L * i + 1L))

  /** Mix for the universal-family multipliers (odd) and increments. */
  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Column-API entry point: aggregate a shingle column into an n-slot
    * minhash signature array. */
  def minhash_sig(shingle: Column, numHashes: Int = 64): Column =
    org.apache.spark.sql.graft.bridge.column(
      MinHashSig(org.apache.spark.sql.graft.bridge.expression(shingle), numHashes)
        .toAggregateExpression())
}
