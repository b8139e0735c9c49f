package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge

/** SQL-surface registration for the custom Catalyst expressions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works alongside the
  * Column API. Two paths:
  *
  *  - [[GraftFunctions.register]]: imperative, session-scoped (temp
  *    functions) — for notebook/library users with an existing session.
  *  - [[GraftExtensions]]: a `spark.sql.extensions` class for spark-submit
  *    (`--conf spark.sql.extensions=graft.functions.GraftExtensions`) —
  *    injects the same functions at session build time.
  */
object GraftFunctions {

  private def arity(name: String, n: Int)(es: Seq[Expression]): Seq[Expression] = {
    if (es.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${es.length}")
    es
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" ->
      (es => { arity("cosine_similarity", 2)(es); CosineSimilarity(es(0), es(1)) }),
    "dot_product_f" ->
      (es => { arity("dot_product_f", 2)(es); DotProductF(es(0), es(1)) }),
    "lsh_buckets" -> { es0 =>
      val es = arity("lsh_buckets", 4)(es0)
      // (embedding, dim, tables, bits) — trailing args must be int literals
      def intArg(e: Expression, what: String): Int = e.eval() match {
        case i: Int => i
        case other => throw new IllegalArgumentException(
          s"lsh_buckets: $what must be an integer literal, got $other")
      }
      LshBuckets(es.head, intArg(es(1), "dim"), intArg(es(2), "tables"),
        intArg(es(3), "bits"))
    },
    // mergeable quantile sketches (see graft.functions.KllSketch)
    "kll_sketch_agg" -> { es =>
      val k = es match {
        case Seq(_) => KllFunctions.DefaultK
        case Seq(_, kExpr) => kExpr.eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"kll_sketch_agg: k must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          s"kll_sketch_agg expects 1 or 2 arguments, got ${es.length}")
      }
      // explicit numeric→double cast (implicit-cast traits are private[sql])
      KllSketchAgg(org.apache.spark.sql.catalyst.expressions.Cast(
        es.head, org.apache.spark.sql.types.DoubleType), k).toAggregateExpression()
    },
    "kll_merge_agg" ->
      (es => { arity("kll_merge_agg", 1)(es)
        KllMergeAgg(es.head, KllFunctions.DefaultK).toAggregateExpression() }),
    "kll_quantiles" ->
      (es => { arity("kll_quantiles", 2)(es); KllQuantiles(es(0), es(1)) }),
    // all MinHash permutation minima in one pass (see MinhashSig)
    "minhash_sig" -> { es0 =>
      val es = arity("minhash_sig", 2)(es0)
      val n = es(1).eval() match {
        case i: Int => i
        case other => throw new IllegalArgumentException(
          s"minhash_sig: numPerms must be an integer literal, got $other")
      }
      MinhashSig(es.head, n)
    },
    // mergeable frequent-items sketches (see graft.functions.FreqSketch)
    "freq_sketch_agg" ->
      (es => { arity("freq_sketch_agg", 1)(es)
        FreqSketchAgg(es.head, FreqFunctions.DefaultMapSize).toAggregateExpression() }),
    "freq_merge_agg" ->
      (es => { arity("freq_merge_agg", 1)(es)
        FreqMergeAgg(es.head, FreqFunctions.DefaultMapSize).toAggregateExpression() }),
    "freq_top_items" ->
      (es => { arity("freq_top_items", 1)(es); FreqTopItems(es.head) }),
    // the repo-wide portable 60-bit hash (md5 slice — bit-identical in
    // DuckDB: conv(substring(md5(x),1,15),16,10)); composed from stock
    // Catalyst expressions so it codegens like the Column form
    "portable_hash60" -> { es0 =>
      import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
      import org.apache.spark.sql.types.{BinaryType, LongType}
      val es = arity("portable_hash60", 1)(es0)
      Cast(Conv(Substring(Md5(Cast(es.head, BinaryType)),
        Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)
    },
    // real ranked-merges BPE over the loaded vocab (see graft.functions.Bpe)
    "bpe_tokens" ->
      (es => { arity("bpe_tokens", 1)(es); BpeTokens(es.head) }),
    // mergeable theta sketches: distinct-count set algebra in SQL
    "theta_sketch_agg" ->
      (es => { arity("theta_sketch_agg", 1)(es)
        ThetaSketchAgg(es.head).toAggregateExpression() }),
    "theta_union" ->
      (es => { arity("theta_union", 2)(es); ThetaUnion(es(0), es(1)) }),
    "theta_intersect" ->
      (es => { arity("theta_intersect", 2)(es); ThetaIntersect(es(0), es(1)) }),
    "theta_anotb" ->
      (es => { arity("theta_anotb", 2)(es); ThetaAnotB(es(0), es(1)) }),
    "theta_estimate" ->
      (es => { arity("theta_estimate", 1)(es); ThetaEstimate(es.head) }))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      Bridge.registerFunction(spark, name, builder)
    }
}

/** `spark.sql.extensions` entry point injecting the graft functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
