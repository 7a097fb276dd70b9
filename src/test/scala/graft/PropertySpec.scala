package graft

import java.math.BigInteger

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.BigIntSum
import graft.operators.TextDedup
import graft.sinks.BalanceUpsert

/** ScalaCheck properties for the merge-safety claims the scale design relies
  * on: partial aggregation is only correct if reduce/merge commute and
  * associate, and dedup is only correct if it is idempotent under redelivery.
  * (Raw ScalaCheck — the scalatest bridge artifact is not on the offline
  * classpath.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int = 30): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(r.passed, r.status.toString)
  }

  test("property: exact dedup is idempotent under arbitrary redelivery") {
    val gen = for {
      ids <- Gen.listOfN(8, Gen.chooseNum(0L, 4L))
      replay <- Gen.listOf(Gen.chooseNum(0, 7))
    } yield (ids, replay)
    check(Prop.forAll(gen) { case (ids, replay) =>
      val rows = ids.zipWithIndex.map { case (c, i) => (i.toLong, s"content $c") }
      rows.isEmpty || {
        val replayed = rows ++ replay.filter(_ < rows.size).map(rows)
        val once = TextDedup.exactDedup(rows.toDF("doc_id", "text"), "doc_id", "text")
          .collect().map(_.getString(1)).toSet
        val again = TextDedup.exactDedup(replayed.toDF("doc_id", "text"), "doc_id", "text")
          .collect().map(_.getString(1)).toSet
        again == once
      }
    }, minTests = 10)
  }

  test("property: simhash aggregator merge is commutative and associative") {
    val a = TextDedup.simhashAgg
    def buf(xs: List[Long]) = xs.foldLeft(a.zero)((b, h) => a.reduce(b.clone(), h))
    check(Prop.forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long), Gen.listOf(Gen.long)) {
      (x: List[Long], y: List[Long], z: List[Long]) =>
        val leftAssoc = a.merge(a.merge(buf(x), buf(y)), buf(z))
        val rightAssoc = a.merge(buf(x), a.merge(buf(y), buf(z)))
        val ab = a.merge(buf(x), buf(y))
        val ba = a.merge(buf(y), buf(x))
        a.finish(leftAssoc) == a.finish(rightAssoc) && a.finish(ab) == a.finish(ba)
    })
  }

  test("property: balance merge commutes and associates across batch splits") {
    val rowGen = for {
      bal <- Gen.chooseNum(-1000000L, 1000000L)
      ts <- Gen.chooseNum(0L, 5L)
      idx <- Gen.chooseNum(0, 2)
      rid <- Gen.oneOf("r1", "r2", "r3", "r4")
    } yield BalanceUpsert.BalanceRow("acct", java.math.BigDecimal.valueOf(bal),
      java.math.BigDecimal.valueOf(ts), s"b-$rid", s"c-$rid", idx, s"tx-$rid", rid)
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows: List[BalanceUpsert.BalanceRow] =>
      val oneShot = rows.reduce(BalanceUpsert.merge)
      (1 until rows.size).forall { cut =>
        val (l, r) = rows.splitAt(cut)
        val split = BalanceUpsert.merge(l.reduce(BalanceUpsert.merge), r.reduce(BalanceUpsert.merge))
        split.balance.compareTo(oneShot.balance) == 0 &&
          split.receiptId == oneShot.receiptId &&
          split.blockTimestamp.compareTo(oneShot.blockTimestamp) == 0
      }
    })
  }

  test("property: BigIntSum is exact beyond DecimalType(38) and merge-safe") {
    val bigGen = Gen.listOfN(40, Gen.numChar).map(_.mkString.dropWhile(_ == '0'))
      .suchThat(_.nonEmpty)
    check(Prop.forAll(Gen.nonEmptyListOf(bigGen)) { xs: List[String] =>
      val a = BigIntSum.agg
      val expected = xs.map(new BigInteger(_)).reduce(_ add _).toString
      val serial = a.finish(xs.foldLeft(a.zero)((b, v) => a.reduce(b, v)))
      serial == expected && (1 until xs.size).forall { cut =>
        val (l, r) = xs.splitAt(cut)
        a.finish(a.merge(
          l.foldLeft(a.zero)((b, v) => a.reduce(b, v)),
          r.foldLeft(a.zero)((b, v) => a.reduce(b, v)))) == expected
      }
    })
  }

  test("BigIntSum in a grouped Dataset aggregation sums 45-digit amounts") {
    val big = "1" + "0" * 44 // 10^44 — over the DecimalType(38) cap
    val ds = Seq(("a", big), ("a", big), ("b", "5")).toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2).agg(BigIntSum.column)
      .collect().toMap
    assert(out("a") === "2" + "0" * 44)
    assert(out("b") === "5")
  }

  /** The registered q_bigint_sum now runs the SCALE path — three native
    * decimal part-sums + one WideSumTotal carry per group — so it must agree
    * with the general BigIntSum Aggregator on arbitrary 30-63 digit values
    * (the query's actual domain: decimal(38)-bounded amounts × 10^25).
    */
  test("property: digit-split native sums + WideSumTotal equals BigIntSum") {
    import org.apache.spark.sql.functions._
    val digitsGen = for {
      head <- Gen.chooseNum(1, 9)
      len <- Gen.chooseNum(5, 38)
      tail <- Gen.listOfN(len - 1, Gen.numChar)
    } yield head.toString + tail.mkString + "0" * 25
    check(Prop.forAll(Gen.nonEmptyListOf(digitsGen)) { xs: List[String] =>
      val expected = xs.map(new BigInteger(_)).reduce(_ add _).toString
      val raw = col("raw")
      val L = length(raw)
      val got = xs.map(("k", _)).toDF("k", "raw")
        .select(col("k"),
          when(L > 36, substr(raw, lit(1), L - 36)).otherwise(lit("0"))
            .cast("decimal(27,0)").as("hi"),
          when(L > 18, substr(raw, greatest(L - 35, lit(1)), least(L - 18, lit(18))))
            .otherwise(lit("0")).cast("decimal(18,0)").as("mid"),
          substr(raw, greatest(L - 17, lit(1)), lit(18)).cast("decimal(18,0)").as("lo"))
        .groupBy(col("k"))
        .agg(sum(col("hi")).as("hi"), sum(col("mid")).as("mid"), sum(col("lo")).as("lo"))
        .select(graft.functions.WideSumTotal.wideSumTotal(col("hi"), col("mid"), col("lo")))
        .head().getString(0)
      got == expected
    }, minTests = 15)
  }

  test("property: jaccard pair emission is order-insensitive (doc_a < doc_b)") {
    check(Prop.forAll(Gen.chooseNum(2, 5)) { n: Int =>
      val docs = (1L to n.toLong).map(i =>
        (i, (0 to 8).map(j => s"w${(i + j) % 6}").mkString(" ")))
      val fwd = TextDedup.jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text", 2, 30)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val rev = TextDedup.jaccardPairs(docs.reverse.toDF("doc_id", "text"), "doc_id", "text", 2, 30)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      fwd == rev && fwd.forall { case (a, b) => a < b }
    }, minTests = 5)
  }
}
