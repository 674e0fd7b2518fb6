package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-behavior and pruning-property tests for the z-order layout
  * operator (q249). The authoritative value check is the DuckDB oracle;
  * these specs pin the bit-level interleave and the property the layout
  * exists for: bounded per-bucket bounding boxes in BOTH dimensions.
  */
class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  test("zInterleave: bit-exact Morton round-trip on random coordinates") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong))
    val rows = pts.toDF("xq", "yq")
      .select(col("xq"), col("yq"),
        Layout.zInterleave(col("xq"), col("yq")).as("zv"))
      .collect()
    rows.foreach { r =>
      val (xq, yq, zv) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // reference de-interleave in plain Scala
      var (x, y) = (0L, 0L)
      (0 until Layout.ZBits).foreach { i =>
        x |= ((zv >> (2 * i)) & 1L) << i
        y |= ((zv >> (2 * i + 1)) & 1L) << i
      }
      assert(x == xq && y == yq, s"round-trip failed for ($xq,$yq): $zv")
    }
    // bit placement: x occupies the even positions, y the odd ones
    val placed = spark.range(1).select(
      Layout.zInterleave(lit(0xFFFFL), lit(0L)).as("zx"),
      Layout.zInterleave(lit(0L), lit(0xFFFFL)).as("zy")).head()
    assert(placed.getLong(0) == 0x55555555L, "x bits must land even")
    assert(placed.getLong(1) == 0xAAAAAAAAL, "y bits must land odd")
  }

  test("q249: zorder buckets bound BOTH dims; linear buckets only one") {
    val df = Layout.zorderLayout(spark, sf).cache()
    val all = df.collect()
    assert(all.nonEmpty && all.length <= 128)
    val ckSpan = all.map(r => r.getLong(4)).max - all.map(r => r.getLong(3)).min
    val daySpan = all.map(r => r.getLong(6)).max - all.map(r => r.getLong(5)).min
    val zb = all.filter(_.getString(0) == "zorder")
    val lb = all.filter(_.getString(0) == "linear")
    assert(zb.nonEmpty && lb.nonEmpty)
    // every zorder bucket: bounding box <= 1/8 of each dim (+ grid slack)
    zb.foreach { r =>
      assert(r.getLong(4) - r.getLong(3) <= ckSpan / 8 + ckSpan / 64 + 2,
        s"zorder bucket ${r.getLong(1)} ck span too wide")
      assert(r.getLong(6) - r.getLong(5) <= daySpan / 8 + daySpan / 64 + 2,
        s"zorder bucket ${r.getLong(1)} day span too wide")
    }
    // linear buckets: narrow in ck but (median bucket) near-full day span
    val linFullDay = lb.count(r => r.getLong(6) - r.getLong(5) > daySpan / 2)
    assert(linFullDay >= lb.length / 2,
      "linear layout should leave the day dimension unbounded")

    // pruning arithmetic for an off-center 1/8 x 1/8 box predicate:
    // rows touched under stats-pruned scan = rows of overlapping buckets
    val ckLo = all.map(_.getLong(3)).min + ckSpan / 16
    val ckHi = ckLo + ckSpan / 8
    val dyLo = all.map(_.getLong(5)).min + 9 * daySpan / 16
    val dyHi = dyLo + daySpan / 8
    def touched(rs: Array[org.apache.spark.sql.Row]): Long =
      rs.filter(r => r.getLong(3) <= ckHi && r.getLong(4) >= ckLo &&
          r.getLong(5) <= dyHi && r.getLong(6) >= dyLo)
        .map(_.getLong(2)).sum
    val total = lb.map(_.getLong(2)).sum
    val (tLin, tZ) = (touched(lb), touched(zb))
    assert(tZ < tLin,
      s"zorder should touch fewer rows than linear ($tZ vs $tLin of $total)")
    df.unpersist()
    ()
  }
}
