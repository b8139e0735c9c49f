package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** All LSH bucket ids of an embedding in one pass: for each of `tables`
  * hash tables, the bucket is the table id prefixed onto `bits` sign bits
  * of random-hyperplane dot products. Returns `array<int>` of length
  * `tables`.
  *
  * The hyperplanes are deterministic Gaussians (seeded per table/bit) held
  * as a flat float[] *reference object* — NOT literal AST nodes — so the
  * expression tree stays tiny and the generated code is one triple loop.
  * (The naive formulation — tables × bits literal-array dot products — blew
  * up codegen size and planning time.)
  */
case class LshBuckets(child: Expression, dim: Int, tables: Int, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float> input")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  /** Flat [table][bit][dim] hyperplane components, seeded deterministically. */
  @transient lazy val planes: Array[Float] = LshBuckets.planes(dim, tables, bits)

  private def compute(x: ArrayData): GenericArrayData = {
    val n = math.min(dim, x.numElements())
    val out = new Array[Int](tables)
    var l = 0
    while (l < tables) {
      var code = 0
      var b = 0
      while (b < bits) {
        val base = (l * bits + b) * dim
        var dot = 0.0
        var d = 0
        while (d < n) { dot += planes(base + d).toDouble * x.getFloat(d).toDouble; d += 1 }
        if (dot > 0.0) code |= (1 << b)
        b += 1
      }
      out(l) = (l << bits) | code
      l += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("out")
      val l = ctx.freshName("l"); val b = ctx.freshName("b")
      val d = ctx.freshName("d"); val n = ctx.freshName("n")
      val code = ctx.freshName("code"); val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dim, $x.numElements());
         |int[] $out = new int[$tables];
         |for (int $l = 0; $l < $tables; $l++) {
         |  int $code = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $base = ($l * $bits + $b) * $dim;
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += (double) $planesRef[$base + $d] * (double) $x.getFloat($d);
         |    }
         |    if ($dot > 0.0) $code |= (1 << $b);
         |  }
         |  $out[$l] = ($l << $bits) | $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {
  /** Deterministic Gaussian hyperplanes, flattened [table][bit][dim]. */
  def planes(dim: Int, tables: Int, bits: Int): Array[Float] = {
    val out = new Array[Float](tables * bits * dim)
    for (l <- 0 until tables; b <- 0 until bits) {
      val rng = new scala.util.Random(1000L * l + b)
      val base = (l * bits + b) * dim
      for (d <- 0 until dim) out(base + d) = rng.nextGaussian().toFloat
    }
    out
  }

  def buckets(embedding: Column, dim: Int, tables: Int, bits: Int): Column =
    Bridge.column(LshBuckets(Bridge.expression(embedding), dim, tables, bits))
}
