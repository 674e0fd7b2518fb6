package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused codegen kernels for the per-document repetition signals
  * (Gopher-style gates in q118/q121/q242 and the corpus report family).
  *
  * The higher-order originals are interpreted per element:
  * `topwordPm`'s `aggregate(array_sort(ws), struct(...), ...)` sorts
  * every document's word array with an interpreted comparator and then
  * folds a THREE-FIELD STRUCT allocation per word; `dupBigramPm`
  * materializes every bigram string via `transform(sequence, i =>
  * array_join(slice(ws, i, 2)))` twice (once raw, once through
  * `array_distinct`). Both signals only need COUNTS.
  *
  * Equivalences (asserted in QuantKernelsSpec):
  * - longest equal run of the SORTED array ≡ the maximum multiplicity
  *   of any element — sorting only groups equal elements together, so
  *   [[MaxElemCount]]'s hash-count is value-identical to the
  *   sort-then-run fold (including the empty-array → 0 and
  *   first-element-equals-the-fold-seed edge: run starts at 0, so the
  *   seed can never inflate a run).
  * - duplicate-bigram count ≡ (n_bigrams, distinct_bigrams) where a
  *   bigram is adjacent words joined with one space; split-on-space
  *   tokens cannot contain spaces, so joined-string equality is pair
  *   equality ([[BigramStats]] returns both counts).
  */
case class MaxElemCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "max_elem_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_elem_count expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = new java.util.HashMap[UTF8String, java.lang.Long](Math.max(16, n * 2))
    var best = 0L; var i = 0
    while (i < n) {
      val w = a.getUTF8String(i)
      val prev = m.get(w)
      val c: Long = if (prev == null) 1L else prev.longValue() + 1L
      m.put(w, java.lang.Long.valueOf(c))
      if (c > best) best = c
      i += 1
    }
    best
  }

  // Janino (Spark's codegen compiler) erases generic type arguments, so
  // generated code must use RAW collection types with explicit casts —
  // `Long c = map.get(w)` with a generic HashMap fails to compile and
  // silently disables codegen for the whole stage.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val best = ctx.freshName("best")
      val w = ctx.freshName("w"); val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      s"""
         |int $n = $a.numElements();
         |java.util.HashMap $m = new java.util.HashMap(Math.max(16, $n * 2));
         |long $best = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $w = $a.getUTF8String($i);
         |  java.lang.Long $c = (java.lang.Long) $m.get($w);
         |  long $cv = ($c == null) ? 1L : $c.longValue() + 1L;
         |  $m.put($w, java.lang.Long.valueOf($cv));
         |  if ($cv > $best) $best = $cv;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (n_bigrams, n_distinct_bigrams) of the word array as array<long>[2]
  * — adjacent words joined with one space, exactly `wordGrams(text, 2)`
  * counted raw and through `array_distinct`. */
case class BigramStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bigram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_stats expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < 2) return UnsafeArrayData.fromPrimitiveArray(Array(0L, 0L))
    val seen = new java.util.HashSet[UTF8String](n * 2)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < n - 1) {
      seen.add(UTF8String.concat(a.getUTF8String(i), space, a.getUTF8String(i + 1)))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array((n - 1).toLong, seen.size.toLong))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val seen = ctx.freshName("seen"); val space = ctx.freshName("space")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $n = $a.numElements();
         |if ($n < 2) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(new long[]{0L, 0L});
         |} else {
         |  java.util.HashSet $seen = new java.util.HashSet($n * 2);
         |  $u $space = $u.fromString(" ");
         |  for (int $i = 0; $i < $n - 1; $i++) {
         |    $seen.add($u.concat($a.getUTF8String($i), $space, $a.getUTF8String($i + 1)));
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(new long[]{(long) ($n - 1), (long) $seen.size()});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernels {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def max_elem_count(a: Column): Column = column(MaxElemCount(expression(a)))
  def bigram_stats(a: Column): Column = column(BigramStats(expression(a)))
}
