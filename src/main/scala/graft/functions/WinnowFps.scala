package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint set (Schleimer et al., SIGMOD 2003 — the MOSS
  * scheme) as a native Catalyst expression: polynomial hash of every
  * K-codepoint gram (h·31 + c mod 1e9+7), minimum of each window of W
  * consecutive gram hashes, distinct minima per document.
  *
  * This is the case the engine's extension preference order exists for:
  * the semantics ARE expressible with built-in higher-order functions
  * (`transform`/`aggregate`/`slice` — kept as the cross-checked reference
  * formulation in `Dedup.winnowFingerprintSetsHofFrom`), but HOF lambdas
  * run interpreted: measured at sf0.1 (WinnowBench, median of 3), this
  * fused O(L·K) loop is 13× faster than the carefully STAGED HOF form
  * (0.29 s vs 3.79 s) and ~1000× faster than the naive inlined HOF form
  * (330 s — each lambda re-evaluating its array subtree per element).
  * `doGenCode` emits a single static call, so the projection stays
  * inside whole-stage codegen.
  *
  * The mod-1e9+7 hash (not FNV like [[PolyHash]]) is chosen so a DuckDB
  * SQL oracle can replay the fingerprints bit-exactly in signed BIGINT —
  * no 64-bit overflow, no unsigned mismatch.
  */
case class WinnowFps(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    WinnowFps.winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = WinnowFps.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.winnow($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  val K = 16           // gram length (codepoints)
  val W = 8            // winnow window (grams)
  val P = 1000000007L  // hash modulus

  /** One pass per document: O(L·K) gram hashing + O(L·W) window minima.
    * Codepoint iteration matches `ascii()` per character in both engines. */
  def winnow(s: UTF8String): GenericArrayData = {
    val cps = s.toString.codePoints().toArray
    val nGram = cps.length - K + 1
    val nWin = nGram - W + 1
    if (nWin < 1) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nGram)
    var i = 0
    while (i < nGram) {
      var h = 0L
      var j = 0
      while (j < K) { h = (h * 31L + cps(i + j)) % P; j += 1 }
      hs(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nWin) {
      var m = Long.MaxValue
      var j = 0
      while (j < W) { val v = hs(i + j); if (v < m) m = v; j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point: `winnow_fps(textCol)`. */
  def winnow_fps(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      WinnowFps(org.apache.spark.sql.graft.bridge.expression(text)))
}
