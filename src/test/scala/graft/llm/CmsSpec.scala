package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {

  private def words(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("term")
  }

  private def items(ts: Seq[String]) = {
    import spark.implicits._
    ts.toDF("term")
  }

  test("estimates never undercount (the structural CMS guarantee)") {
    val rng = new scala.util.Random(5)
    // zipfish: token_i appears ~1000/i times
    val rows = (1 to 60).flatMap(i =>
      Seq.fill(1000 / i)(s"token_${i}_${"x" * (i % 3)}"))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = Cms.sketch(words(rng.shuffle(rows)), "term",
      depth = 4, width = 64) // narrow -> heavy collisions
    val est = Cms.estimate(sk, items(exact.keys.toSeq), "term",
        depth = 4, width = 64)
      .collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("cms_est"))
      .toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t: est ${est(t)} < exact $c")
    }
  }

  test("wide sketch is collision-free on a small vocab: est == exact") {
    val rows = (1 to 40).flatMap(i => Seq.fill(i)(s"word_number_$i"))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = Cms.sketch(words(rows), "term", depth = 4, width = 65536)
    val est = Cms.estimate(sk, items(exact.keys.toSeq), "term",
        depth = 4, width = 65536)
      .collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("cms_est"))
      .toMap
    assert(est == exact)
    // an item never counted reads 0 in the collision-free regime
    val absent = Cms.estimate(sk, items(Seq("never_seen_token_zz")),
        "term", depth = 4, width = 65536)
      .collect().head.getAs[Long]("cms_est")
    assert(absent == 0L)
  }

  test("sketch is merge/partitioning-invariant") {
    val rows = (0 until 300).map(i => s"t${i % 37}")
    val a = Cms.sketch(words(rows), "term", 4, 128)
      .orderBy("row", "bucket").collect().toSeq
    val b = Cms.sketch(words(rows).repartition(11), "term", 4, 128)
      .orderBy("row", "bucket").collect().toSeq
    assert(a == b)
    assert(a.map(_.getAs[Long]("cnt")).sum == 4L * 300)
  }
}
