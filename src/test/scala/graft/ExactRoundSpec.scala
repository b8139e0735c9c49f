package graft

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.ExactRound

/** The exact-integer half-up law, tested against BigDecimal directly:
  * `(2·num + den) div (2·den)` must equal round-half-AWAY-FROM-ZERO of
  * num/den for every int64 pair (and decimal(38,0) pairs beyond
  * int64) — the property the whole cross-engine rounding closure
  * stands on. */
class ExactRoundSpec extends SparkSpecBase {

  private def refHalfUp(num: BigInt, den: BigInt): BigInt = {
    val q = new JBD(num.bigInteger).divide(new JBD(den.bigInteger),
      new MathContext(50))
    BigInt(q.setScale(0, RoundingMode.HALF_UP).toBigIntegerExact)
  }

  test("halfUpPos matches BigDecimal HALF_UP on deterministic long pairs") {
    import spark.implicits._
    // a Lehmer stream covering tie and off-tie quotients, plus planted
    // exact-tie cases (num = k·den ± den/2)
    val rnd = Iterator.iterate(48271L)(x => (x * 48271L) % 2147483647L)
      .take(400).toSeq
    val planted = Seq[(Long, Long)](
      (5L, 2L), (7L, 2L), (25L, 10L), (35L, 10L), (1L, 3L), (2L, 3L),
      (999999999999999L, 2L), (0L, 7L), (1L, 1L))
    val cases = rnd.grouped(2).collect { case Seq(a, b) =>
      (a % 1000003L, math.max(1L, b % 9973L))
    }.toSeq ++ planted
    val df = cases.toDF("num", "den")
      .withColumn("got", ExactRound.halfUpPos("num", "den"))
      .collect()
    for (r <- df) {
      val (n, d, got) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(BigInt(got) == refHalfUp(n, d), s"halfUpPos($n, $d) = $got")
    }
  }

  test("halfUp is half-away-from-zero: halfUp(-n, d) = -halfUpPos(n, d)") {
    import spark.implicits._
    val cases = Seq[(Long, Long)]((5L, 2L), (7L, 2L), (3L, 2L),
      (1L, 3L), (2L, 3L), (123457L, 10L), (999995L, 10L))
    val df = cases.flatMap { case (n, d) => Seq((n, d), (-n, d)) }
      .toDF("num", "den")
      .withColumn("got", ExactRound.halfUp("num", "den"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for ((n, d) <- cases) {
      assert(df((n, d)) == -df((-n, d)),
        s"asymmetry at ($n, $d): ${df((n, d))} vs ${df((-n, d))}")
      assert(BigInt(df((n, d))) == refHalfUp(n, d))
    }
  }

  test("decimal(38,0) operands carry the law past int64") {
    import spark.implicits._
    // numerator ~2e20 (past int64, the q_cox/cronbach staging shape)
    // over a denominator that lands the QUOTIENT on an exact .5 tie
    // well inside int64 — the law's contract is that the scaled
    // quotient (a bounded statistic x 10^d) fits a long, not the
    // operands
    val bigNum = BigInt("200000000000000100000") // (2·10^15 + 1)·10^5
    val den = 200000L                            // 2·10^5 → k + 0.5
    val got = Seq(1).toDF("x")
      .withColumn("num",
        lit(new JBD(bigNum.bigInteger)).cast(DecimalType(38, 0)))
      .withColumn("den", lit(den))
      .select(ExactRound.halfUpPos("num", "den").as("got"))
      .collect()(0).getLong(0)
    assert(BigInt(got) == refHalfUp(bigNum, BigInt(den)),
      s"got $got for the >int64-operand tie")
    assert(got == 1000000000000001L) // k + 0.5 rounds away from zero
  }

  test("halfUpPosBig carries the law past an int64 QUOTIENT (sf1 kruskal)") {
    import spark.implicits._
    // `div` casts its result to long and WRAPS past int64 — the sf1
    // crossing: kruskal's t2_g quotient ~7e19. halfUpPosBig's
    // mod-and-divide floor form stays in decimal all the way.
    val num = BigInt("68886370797849760779") // the quotient itself >int64
    val den = 1L
    val df = Seq(1).toDF("x")
      .withColumn("num",
        lit(new JBD(num.bigInteger)).cast(DecimalType(38, 0)))
      .withColumn("den", lit(den).cast(DecimalType(38, 0)))
    val wrapped = df.select(ExactRound.halfUpPos("num", "den").as("g"))
      .collect()(0).getLong(0)
    assert(wrapped < 0, "precondition: plain div wraps this quotient")
    val big = df.select(ExactRound.halfUpPosBig("num", "den").as("g"))
      .collect()(0).getDecimal(0)
    assert(BigInt(big.toBigInteger) == refHalfUp(num, BigInt(den)),
      s"got $big past-int64 quotient")
    // and a half-tie past int64 still rounds away from zero
    val tie = df
      .withColumn("num", lit(new JBD(
        BigInt("100000000000000000001").bigInteger)).cast(DecimalType(38, 0)))
      .withColumn("den", lit(2L).cast(DecimalType(38, 0)))
      .select(ExactRound.halfUpPosBig("num", "den").as("g"))
      .collect()(0).getDecimal(0)
    assert(BigInt(tie.toBigInteger) ==
      refHalfUp(BigInt("100000000000000000001"), BigInt(2)))
  }
}
