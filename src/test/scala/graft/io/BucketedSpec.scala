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
}
