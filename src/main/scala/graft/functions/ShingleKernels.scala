package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the sliding-window / segmentation passes of the
  * dedup and text families. The higher-order originals
  * (`transform(sequence(...), i => md5(array_join(slice(w, i, n))))`
  * and friends) are HigherOrderFunctions — CodegenFallback, an
  * interpreted lambda invocation per window, plus a sliced array AND a
  * joined string allocated per window. Each kernel does one pass over
  * the word array with the per-window work inlined.
  *
  * Codegen discipline (the r19 MaxElemCount lesson): the generated code
  * is a SINGLE static call into [[ShingleKernelRuntime]] — no loops, no
  * collections, no generics for Janino to mis-compile — and the
  * interpreted eval calls the same helper, so the two paths cannot
  * diverge.
  *
  * Equivalences asserted in QuantKernelsSpec (bit-equality vs the HOF
  * forms they replace, including the short-input and empty-string
  * edges).
  */
object ShingleKernelRuntime {
  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest): UTF8String = {
    val d = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** md5 hex of every n-word sliding window, words joined with one
    * space (null elements skipped, exactly `array_join`'s rule).
    * Returns the empty array when fewer than n words — the
    * `when(size(w) >= n, ...).otherwise(array())` guard folded in. */
  def windowMd5(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val wb = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      wb(i) = if (a.isNullAt(i)) null else a.getUTF8String(i).getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](len - n + 1)
    var s = 0
    while (s <= len - n) {
      var first = true
      var j = s
      while (j < s + n) {
        val b = wb(j)
        if (b != null) {
          if (!first) md.update(' '.toByte)
          md.update(b)
          first = false
        }
        j += 1
      }
      out(s) = md5Hex(md) // digest() resets the engine for the next window
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Consecutive fixed-size word segments joined with one space —
    * `transform(sequence(0, ceil(len/segWords)-1), i =>
    * array_join(slice(w, i*segWords+1, segWords), " "))` in one pass.
    * The len == 0 edge reproduces the HOF form exactly: ceil(0/s)-1 is
    * -1 and `sequence(0, -1)` steps DOWN ([0, -1]), yielding two empty
    * segments (unreachable via split(), which never returns an empty
    * array, but bit-equality is the contract). */
  def wordSegments(a: ArrayData, segWords: Int): ArrayData = {
    val len = a.numElements()
    if (len == 0)
      return new GenericArrayData(
        Array[Any](UTF8String.EMPTY_UTF8, UTF8String.EMPTY_UTF8))
    val nseg = (len + segWords - 1) / segWords
    val out = new Array[Any](nseg)
    var i = 0
    while (i < nseg) {
      val from = i * segWords
      val until = math.min(len, from + segWords)
      var nBytes = 0
      var j = from
      while (j < until) {
        if (!a.isNullAt(j)) nBytes += a.getUTF8String(j).numBytes() + 1
        j += 1
      }
      val buf = new Array[Byte](math.max(0, nBytes - 1))
      var off = 0
      var first = true
      j = from
      while (j < until) {
        if (!a.isNullAt(j)) {
          val w = a.getUTF8String(j)
          // `first`, not `off > 0`: array_join separates EVERY pair of
          // non-null elements, empty strings included
          if (!first) { buf(off) = ' '.toByte; off += 1 }
          w.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
          off += w.numBytes()
          first = false
        }
        j += 1
      }
      out(i) = UTF8String.fromBytes(buf)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Every k-word gram joined with one space — the array form of
    * `TextFunctions.wordGrams` (`transform(sequence(1, len-k+1), i =>
    * array_join(slice(w, i, k), " "))` with the short-input guard).
    * Returns the empty array when fewer than k words. */
  def wordGramsArr(a: ArrayData, k: Int): ArrayData = {
    val len = a.numElements()
    if (len < k) return new GenericArrayData(Array.empty[Any])
    val wb = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      wb(i) = if (a.isNullAt(i)) null else a.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](len - k + 1)
    var s = 0
    while (s <= len - k) {
      var nBytes = 0
      var j = s
      while (j < s + k) {
        if (wb(j) != null) nBytes += wb(j).length + 1
        j += 1
      }
      val buf = new Array[Byte](math.max(0, nBytes - 1))
      var off = 0
      var first = true
      j = s
      while (j < s + k) {
        val b = wb(j)
        if (b != null) {
          if (!first) { buf(off) = ' '.toByte; off += 1 }
          System.arraycopy(b, 0, buf, off, b.length)
          off += b.length
          first = false
        }
        j += 1
      }
      out(s) = UTF8String.fromBytes(buf)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** All lowercased character k-shingles (with duplicates) — the array
    * form of `TextFunctions.shinglesAll` (`transform(sequence(1,
    * numChars-k+1), i => lower(text).substr(i, k))`). Character ==
    * code point, exactly `UTF8String.substringSQL`'s unit; windows are
    * sliced from a single code-point offset table instead of paying a
    * from-the-start scan per substr call. */
  def charShingles(text: UTF8String, k: Int): ArrayData = {
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val nb = bytes.length
    // offsets(c) = byte offset where code point c starts
    val offsets = new Array[Int](lower.numChars() + 1)
    var c = 0
    var o = 0
    while (o < nb) {
      offsets(c) = o
      o += UTF8String.numBytesForFirstByte(bytes(o))
      c += 1
    }
    offsets(c) = nb
    val nChars = c
    if (nChars < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - k + 1)
    var s = 0
    while (s <= nChars - k) {
      out(s) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offsets(s), offsets(s + k)))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** All adjacent word pairs as struct rows — the array form of
    * `transform(sequence(1, len-1), i => struct(element_at(w, i),
    * element_at(w, i+1)))` with the single-token guard folded in. */
  def adjacentPairs(a: ArrayData): ArrayData = {
    val len = a.numElements()
    if (len < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - 1)
    var i = 0
    var prev: UTF8String = if (a.isNullAt(0)) null else a.getUTF8String(0)
    while (i < len - 1) {
      val next = if (a.isNullAt(i + 1)) null else a.getUTF8String(i + 1)
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](prev, next))
      prev = next
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Strided fixed-size chunk windows over the word array — the array
    * form of `transform(sequence(0, nc-1), i => slice(w, i*stride+1,
    * sizeW))` with `nc = 1 + greatest(0, (len - sizeW + stride - 1)
    * div stride)` folded in (`div` truncates toward zero, matching the
    * SQL operator). */
  def chunkWindows(a: ArrayData, sizeW: Int, stride: Int): ArrayData = {
    val len = a.numElements()
    val nc = 1 + math.max(0L, (len.toLong - sizeW + stride - 1) / stride).toInt
    val out = new Array[Any](nc)
    var i = 0
    while (i < nc) {
      val from = i * stride
      val until = math.min(len, from + sizeW)
      val chunk = new Array[Any](math.max(0, until - from))
      var j = from
      while (j < until) {
        chunk(j - from) = if (a.isNullAt(j)) null else a.getUTF8String(j)
        j += 1
      }
      out(i) = new GenericArrayData(chunk)
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] object OmitRuntime {
  /** Join the unmarked words with single spaces (array_join semantics:
    * a separator between every pair of kept elements, empties kept). */
  private[functions] def joinKept(a: ArrayData, keep: Array[Boolean]): UTF8String = {
    val len = a.numElements()
    var nBytes = 0
    var i = 0
    while (i < len) {
      if (keep(i) && !a.isNullAt(i)) nBytes += a.getUTF8String(i).numBytes() + 1
      i += 1
    }
    val buf = new Array[Byte](math.max(0, nBytes - 1))
    var off = 0
    var first = true
    i = 0
    while (i < len) {
      if (keep(i) && !a.isNullAt(i)) {
        val w = a.getUTF8String(i)
        if (!first) { buf(off) = ' '.toByte; off += 1 }
        w.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += w.numBytes()
        first = false
      }
      i += 1
    }
    UTF8String.fromBytes(buf)
  }

  /** Words minus the 1-based positions in `drop`, rejoined with " " —
    * the local form of "explode tokens, anti-join covered positions,
    * re-collect in order" (out-of-range drop entries are ignored). */
  def omitTokens(a: ArrayData, drop: ArrayData): UTF8String = {
    val len = a.numElements()
    val keep = Array.fill(len)(true)
    var i = 0
    val nd = drop.numElements()
    while (i < nd) {
      val p = drop.getLong(i)
      if (p >= 1 && p <= len) keep((p - 1).toInt) = false
      i += 1
    }
    joinKept(a, keep)
  }

  /** Words minus the 0-based `segWords`-wide segments in `dropIdx`,
    * rejoined with " " — the local form of "explode segments, anti-join
    * hot digests, re-collect in order" (consecutive fixed segments
    * joined with " " reproduce the original word sequence exactly). */
  def omitSegments(a: ArrayData, segWords: Int, dropIdx: ArrayData): UTF8String = {
    val len = a.numElements()
    val keep = Array.fill(len)(true)
    var i = 0
    val nd = dropIdx.numElements()
    while (i < nd) {
      val s = dropIdx.getLong(i)
      if (s >= 0 && s * segWords < len) {
        var j = (s * segWords).toInt
        val until = math.min(len, j + segWords)
        while (j < until) { keep(j) = false; j += 1 }
      }
      i += 1
    }
    joinKept(a, keep)
  }
}

case class AdjacentPairs(child: Expression) extends UnaryExpression {
  override def prettyName: String = "adjacent_pairs"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adjacent_pairs expects array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    ShingleKernelRuntime.adjacentPairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernelRuntime.adjacentPairs($a);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class OmitTokens(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "omit_tokens"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"omit_tokens expects (array<string>, array<bigint>), got $other")
    }
  override def nullSafeEval(words: Any, drop: Any): Any =
    OmitRuntime.omitTokens(words.asInstanceOf[ArrayData],
      drop.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, d) =>
      s"${ev.value} = graft.functions.OmitRuntime.omitTokens($w, $d);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class OmitSegments(left: Expression, right: Expression, segWords: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "omit_segments"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"omit_segments expects (array<string>, array<bigint>), got $other")
    }
  override def nullSafeEval(words: Any, dropIdx: Any): Any =
    OmitRuntime.omitSegments(words.asInstanceOf[ArrayData], segWords,
      dropIdx.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, d) =>
      s"${ev.value} = graft.functions.OmitRuntime.omitSegments($w, $segWords, $d);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

private[functions] trait StringArrayKernel extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }
}

case class WindowMd5(child: Expression, n: Int) extends StringArrayKernel {
  override def prettyName: String = "window_md5"
  override def nullSafeEval(input: Any): Any =
    ShingleKernelRuntime.windowMd5(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernelRuntime.windowMd5($a, $n);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordSegments(child: Expression, segWords: Int)
    extends StringArrayKernel {
  override def prettyName: String = "word_segments"
  override def nullSafeEval(input: Any): Any =
    ShingleKernelRuntime.wordSegments(input.asInstanceOf[ArrayData], segWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernelRuntime.wordSegments($a, $segWords);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordGramsArr(child: Expression, k: Int) extends StringArrayKernel {
  override def prettyName: String = "word_grams_arr"
  override def nullSafeEval(input: Any): Any =
    ShingleKernelRuntime.wordGramsArr(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernelRuntime.wordGramsArr($a, $k);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  override def prettyName: String = "char_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects string, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    ShingleKernelRuntime.charShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernelRuntime.charShingles($a, $k);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ChunkWindows(child: Expression, sizeW: Int, stride: Int)
    extends UnaryExpression {
  override def prettyName: String = "chunk_windows"
  override def dataType: DataType = child.dataType match {
    case a: ArrayType => ArrayType(a, containsNull = false)
    case _ => ArrayType(ArrayType(StringType), containsNull = false)
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_windows expects array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    ShingleKernelRuntime.chunkWindows(input.asInstanceOf[ArrayData], sizeW, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleKernelRuntime.chunkWindows($a, $sizeW, $stride);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleKernels {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def window_md5(w: Column, n: Int): Column = column(WindowMd5(expression(w), n))
  def word_segments(w: Column, segWords: Int): Column =
    column(WordSegments(expression(w), segWords))
  def word_grams_arr(w: Column, k: Int): Column =
    column(WordGramsArr(expression(w), k))
  def char_shingles(text: Column, k: Int): Column =
    column(CharShingles(expression(text), k))
  def chunk_windows(w: Column, sizeW: Int, stride: Int): Column =
    column(ChunkWindows(expression(w), sizeW, stride))
  def adjacent_pairs(w: Column): Column = column(AdjacentPairs(expression(w)))
  def omit_tokens(w: Column, drop: Column): Column =
    column(OmitTokens(expression(w), expression(drop)))
  def omit_segments(w: Column, dropIdx: Column, segWords: Int): Column =
    column(OmitSegments(expression(w), expression(dropIdx), segWords))
}
