package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r19 pinned-parallelism grouping helper (core/Grouped):
  * the column-keyed grouping must be EQUIVALENT to groupByKey(lambda)
  * in groups and group contents, while its one exchange is the
  * explicit REPARTITION_BY_NUM form AQE never coalesces, sized to the
  * stock shuffle parallelism. These are the invariants every pinned
  * model fit (StlExact, Bsts, GP, S-H-ESD, SPC, ...) relies on. */
class GroupedSpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    (1 to 100).map(i => (s"k${i % 7}", i.toLong, i * 0.5))
      .toDF("sk", "ord", "v")
      .as[(String, Long, Double)]
  }

  test("pinned grouping reproduces groupByKey's groups exactly") {
    import spark.implicits._
    val ds = sample
    val viaLambda = ds.groupByKey(_._1)
      .mapGroups { (k, it) =>
        (k, it.toArray.sortBy(_._2).map(_._3).sum)
      }.collect().sortBy(_._1)
    val viaPinned = Grouped
      .pinned[String, (String, Long, Double)](ds, col("sk"))
      .mapGroups { (k, it) =>
        (k, it.toArray.sortBy(_._2).map(_._3).sum)
      }.collect().sortBy(_._1)
    assert(viaPinned.toSeq == viaLambda.toSeq)
  }

  test("pin sets the stock partition count and keeps keys clustered") {
    val n = Grouped.pinnedPartitions(sample)
    // max(shuffle.partitions=2, defaultParallelism=2) on the test session
    assert(n == math.max(2, spark.sparkContext.defaultParallelism))
    val pinned = Grouped.pin(sample, Seq("sk"))
    assert(pinned.rdd.getNumPartitions == n)
    // every key lives in exactly one partition (hash-clustered)
    val spread = pinned.rdd
      .mapPartitionsWithIndex((p, it) => it.map(r => (r._1, p)))
      .collect().groupBy(_._1).values.map(_.map(_._2).distinct.size)
    assert(spread.forall(_ == 1))
  }

  test("pinned exchange is REPARTITION_BY_NUM (AQE-proof), no second exchange") {
    import spark.implicits._
    val plan = Grouped
      .pinned[String, (String, Long, Double)](sample, col("sk"))
      .mapGroups((k, it) => (k, it.size))
      .queryExecution.executedPlan.toString
    assert(plan.contains("REPARTITION_BY_NUM"))
    // exactly ONE exchange in the whole plan: the grouping rides it
    assert("Exchange".r.findAllIn(plan).size == 1)
  }

  test("keyed grouping adds no exchange over a pinned input") {
    import spark.implicits._
    val plan = Grouped
      .keyed[String, (String, Long, Double)](
        Grouped.pin(sample, Seq("sk")), col("sk"))
      .mapGroups((k, it) => (k, it.size))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1)
  }
}
