package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array as a native Catalyst expression.
  *
  * Classic Charikar simhash: each token contributes +1/-1 per bit position
  * according to its 64-bit hash; the fingerprint sets bit b iff the summed
  * vote is positive. Near-duplicate documents differ in few bits (checked
  * with Hamming distance / band buckets downstream).
  *
  * Implemented with `doGenCode` (a tight 64-counter loop per row) so the
  * whole dedup pipeline — tokenize → simhash → band → self-join — stays in
  * one codegen'd stage: at 100 TB this runs once per document and must not
  * fall out of Tungsten into boxed UDF land.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  // allow Catalyst constant folding when the input is a literal
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(arr: Any): Any = {
    val tokens = arr.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = SimHash64.hashToken(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $cls.hashToken($arr.getUTF8String($i));
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Seeded FNV-1a, shared with PolyHash (seed 7). */
  def hashToken(s: UTF8String): Long = {
    var h = 7L ^ 0xcbf29ce484222325L
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column-API entry point: `simhash64(tokensCol)`. */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.bridge.column(SimHash64(org.apache.spark.sql.graft.bridge.expression(tokens)))
}
