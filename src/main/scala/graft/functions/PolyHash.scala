package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Seeded 64-bit FNV-1a string hash as a native Catalyst expression.
  *
  * This is the extension-point demo the reference leaves open (its
  * `parser<T>` trait-specialization pattern, `src/base/types_utils.h:20-87`):
  * a hot scalar op implemented once with `doGenCode` so it stays inside
  * whole-stage codegen — no Scala-UDF serialization boundary, no boxing in
  * the hot loop. Used by the minhash/simhash/fingerprint dedup operators,
  * which evaluate it 64× per shingle: at 100 TB of documents this is the
  * innermost loop of the pipeline, exactly where codegen pays.
  *
  * The seed parameter turns one expression into the family of independent
  * hash functions minhash needs (h_i = FNV-1a seeded with i).
  */
case class PolyHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"
  // allow Catalyst constant folding when both children are literals
  override def foldable: Boolean = left.foldable && right.foldable

  @inline final def hash(s: UTF8String, seed: Long): Long = {
    var h = seed ^ 0xcbf29ce484222325L
    val n = s.numBytes()
    val bytes = s.getBytes
    var i = 0
    while (i < n) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  override def nullSafeEval(str: Any, seed: Any): Any =
    hash(str.asInstanceOf[UTF8String], seed.asInstanceOf[Number].longValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, seed) => {
      val h = ctx.freshName("h")
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |long $h = $seed ^ 0xcbf29ce484222325L;
         |byte[] $bytes = $s.getBytes();
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h ^ ($bytes[$i] & 0xffL)) * 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PolyHash {
  /** Column-API entry point: `poly_hash(col, seed)`. */
  def poly_hash(c: Column, seed: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      PolyHash(org.apache.spark.sql.graft.bridge.expression(c), org.apache.spark.sql.graft.bridge.expression(seed)))
}
