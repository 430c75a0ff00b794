package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Salted skew joins: exact equivalence with the plain join. */
class SaltedSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .sorted.toSeq

  // a skewed left: one hot key with 400 rows, a tail of singletons;
  // duplicate rows included (the join must preserve multiplicity)
  private def skewedLeft = (
    (1 to 400).map(i => ("hot", i % 7)) ++
      (1 to 50).map(i => (s"k$i", i)) ++
      Seq(("dup", 1), ("dup", 1), (null.asInstanceOf[String], 9))
    ).toDF("k", "lv")

  private def rightSide = (
    Seq(("hot", "H1"), ("hot", "H2"), ("dup", "D")) ++
      (1 to 30).map(i => (s"k$i", s"R$i")) ++
      Seq((null.asInstanceOf[String], "N"))
    ).toDF("k", "rv")

  test("saltedJoin row-set equals the plain inner join") {
    val plain = skewedLeft.join(rightSide, Seq("k"))
    val salted = Salted.saltedJoin(skewedLeft, rightSide, Seq("k"), 8)
    assert(canon(salted) === canon(plain))
    assert(plain.count() === (400 * 2 + 30 + 2)) // fixture sanity
  }

  test("saltedJoinSkewed (hybrid) equals the plain inner join") {
    val plain = skewedLeft.join(rightSide, Seq("k"))
    val hybrid = Salted.saltedJoinSkewed(skewedLeft, rightSide,
      Seq("k"), salts = 8, threshold = 100)
    assert(canon(hybrid) === canon(plain))
  }

  test("hot-key detection finds exactly the keys above threshold") {
    val hot = Salted.hotKeys(skewedLeft, Seq("k"), 100).collect()
      .map(_.getString(0))
    assert(hot.toSeq === Seq("hot"))
    val hot2 = Salted.hotKeys(skewedLeft, Seq("k"), 1).collect()
      .map(_.getString(0)).toSet
    assert(hot2 === Set("hot", "dup"))
  }

  test("the hot key's rows actually spread across multiple salts") {
    val salts = skewedLeft.filter(col("k") === "hot")
      .select(Salted.saltCol(skewedLeft.filter(col("k") === "hot"), 8))
      .distinct().count()
    assert(salts > 4, s"400 hot rows must spread over >4 of 8 salts ($salts)")
  }

  test("salting is deterministic and repartition-invariant") {
    val a = canon(Salted.saltedJoin(skewedLeft, rightSide, Seq("k"), 4))
    val b = canon(Salted.saltedJoin(skewedLeft.repartition(7),
      rightSide.repartition(3), Seq("k"), 4))
    assert(a === b)
  }

  test("integer-micros dev_sum is partition-order-independent") {
    // the q_salted aggregate shape: sum of ±deviations relying on
    // cancellation. Pinned at integer micros the sum is exact and
    // associative, so ANY repartitioning must yield bit-identical
    // doubles (the unpinned double sum this replaces could differ in
    // the last ulp across partition orders).
    val vals = (1 to 4000).map(i =>
      ("hot", (math.sin(i.toDouble) * 250.0)))
    val base = vals.toDF("k", "v")
    def devSum(df: DataFrame): Double = {
      val dim = df.groupBy("k").agg(round(avg("v"), 6).as("k_avg"))
      df.join(dim, Seq("k"))
        .groupBy("k")
        .agg(round(sum(round((col("v") - col("k_avg")) * 1e6)
            .cast("long")).cast("double") / 1e6, 2).as("dev_sum"))
        .collect().head.getDouble(1)
    }
    val a = devSum(base.repartition(1))
    val b = devSum(base.repartition(17, col("v")))
    val c = devSum(base.orderBy(col("v").desc).coalesce(3))
    assert(java.lang.Double.doubleToRawLongBits(a) ===
      java.lang.Double.doubleToRawLongBits(b))
    assert(java.lang.Double.doubleToRawLongBits(a) ===
      java.lang.Double.doubleToRawLongBits(c))
  }

  test("multi-column keys work") {
    val l = Seq((1, "a", 10.0), (1, "a", 20.0), (2, "b", 30.0))
      .toDF("k1", "k2", "lv")
    val r = Seq((1, "a", "x"), (2, "b", "y"), (3, "c", "z"))
      .toDF("k1", "k2", "rv")
    val plain = l.join(r, Seq("k1", "k2"))
    assert(canon(Salted.saltedJoin(l, r, Seq("k1", "k2"), 3)) ===
      canon(plain))
    assert(canon(Salted.saltedJoinSkewed(l, r, Seq("k1", "k2"), 3, 1))
      === canon(plain))
  }
}
