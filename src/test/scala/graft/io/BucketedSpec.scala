package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketing contract: matching bucketed tables join and aggregate with
  * no exchange — the write-once-shuffle-never-again pattern. */
class BucketedSpec extends SparkSpec {

  test("equi-join of matching bucketed tables plans zero shuffles") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    Bucketed.writeBucketed(docs, "b_docs_a", Seq("doc_id"), 4)
    Bucketed.writeBucketed(docs.withColumn("text", upper(col("text"))),
      "b_docs_b", Seq("doc_id"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the join to the SMJ path so the assertion is about bucket
      // co-location, not a broadcast of the (tiny) test table
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_docs_a")
        .join(spark.table("b_docs_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 500L)
      // aggregation on the bucket key also rides the bucketing
      val agg = spark.table("b_docs_a").groupBy("doc_id").count()
      val aplan = agg.queryExecution.executedPlan.toString
      assert(!aplan.contains("Exchange hashpartitioning"),
        s"bucketed groupBy must not shuffle:\n$aplan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_docs_a")
      spark.sql("DROP TABLE IF EXISTS b_docs_b")
    }
  }

  test("q_bucketed (the gated path): both scans are bucketed and the " +
      "fact join plans zero exchanges — the only shuffle is the final " +
      "priority aggregate") {
    try {
      val df = graft.SparkEntry.queries("q_bucketed")(
        spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"the merge hint must keep the bucket-fed SMJ path:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"the scans must report the bucketing:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"the bucketed join must not shuffle either side:\n$plan")
      val exchanges =
        "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"expected exactly the aggregate's exchange, got $exchanges:\n$plan")
      // and the result itself matches the plain parquet join — the
      // oracle states the same contract in the driver gate
      assert(df.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
    }
  }
}
