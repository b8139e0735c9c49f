package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `numPerms` MinHash permutation minima of a shingle set in ONE
  * codegen'd pass: `array<string>` shingles → `array<long>` signature.
  *
  * Each shingle is hashed once (XXH64 over its UTF-8 bytes, Spark's
  * `xxhash64` seed 42); permutation `i` re-hashes that fixed-width long
  * with a per-permutation seed (itself `xxhash64(i)` — the same chaining
  * `xxhash64(lit(i), h)` produces) and keeps the running min. The seeds
  * are a codegen reference object, so the expression tree and generated
  * code stay O(1) in `numPerms` — the loops live in the bytecode, not the
  * plan.
  *
  * This replaces a 64-element higher-order `transform`/`aggregate`
  * pipeline (interpreted per element — measured >100× slower) and, before
  * that, an explode + 64-column min group-by (a full corpus shuffle).
  * Signatures are a pure map stage: at 100 TB they cost one corpus scan,
  * no shuffle, no aggregation state.
  */
case class MinhashSig(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  /** Per-permutation seeds: xxhash64(i) with Spark's default seed 42, the
    * inner hash state after `xxhash64(lit(i), …)` consumes the literal. */
  @transient lazy val seeds: Array[Long] = MinhashSig.seeds(numPerms)

  private def compute(arr: ArrayData): GenericArrayData = {
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < numPerms) {
          val v = XXH64.hashLong(h, seeds(i))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins"); val n = ctx.freshName("n")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numPerms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($j);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $i = 0; $i < $numPerms; $i++) {
         |      long $v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h, $seedsRef[$i]);
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  def seeds(numPerms: Int): Array[Long] =
    Array.tabulate(numPerms)(i => XXH64.hashInt(i, 42L))

  def signature(shingles: Column, numPerms: Int): Column =
    Bridge.column(MinhashSig(Bridge.expression(shingles), numPerms))
}

/** All LSH band hashes of a minhash signature in one pass:
  * `array<long>` signature → `array<long>` of `bands` hashes, band b
  * combining its `rowsPerBand` signature slots via seeded XXH64 chaining
  * (seed 42 → band id → each slot). One tiny expression instead of a
  * `bands × rowsPerBand`-wide hash tree — the band stage's generated
  * code is O(1) in the banding parameters, so Janino compiles in
  * microseconds where the literal tree took the bulk of the LSH
  * pipeline's per-plan compile time. */
case class MinhashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> input, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_bands"

  private def compute(sig: ArrayData): GenericArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashInt(b, 42L)
      var r = 0
      while (r < rowsPerBand) {
        h = XXH64.hashLong(sig.getLong(b * rowsPerBand + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sig => {
      val out = ctx.freshName("out"); val b = ctx.freshName("b")
      val r = ctx.freshName("r"); val h = ctx.freshName("h")
      s"""
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt($b, 42L);
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
         |      $sig.getLong($b * $rowsPerBand + $r), $h);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashBands {
  def bands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(MinhashBands(Bridge.expression(sig), bands, rowsPerBand))
}
