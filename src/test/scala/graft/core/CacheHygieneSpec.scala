package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Machine check for the r16 cache-release contract (ADVICE r15 #2):
  * every iterative graph operator materializes its result and releases
  * ALL of its CacheManager-registered round state before returning, so
  * repeated invocations in one session (a bench runs each query 4+
  * times) accumulate NOTHING in the shared cache.
  *
  * The CacheManager is the right observable: `Checkpoints.fresh`
  * persists through `Dataset.persist`, which registers in the session
  * CacheManager — a strong reference the ContextCleaner can never
  * collect (unlike plain localCheckpoint RDD caches, which die with
  * their frames on GC). Before commit 90f8ff5 the final round's state
  * leaked one entry per invocation and this spec fails on that build.
  *
  * `sharedState`/`cacheManager` are private[sql], reached by
  * reflection (Scala package-private is public bytecode) — this is a
  * test-only read of a stable internal boolean, not a product
  * dependency.
  */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def cacheManagerIsEmpty: Boolean = {
    val ss = spark.getClass.getMethod("sharedState").invoke(spark)
    val cm = ss.getClass.getMethod("cacheManager").invoke(ss)
    cm.getClass.getMethod("isEmpty").invoke(cm)
      .asInstanceOf[Boolean]
  }

  test("iterative graph operators leave the CacheManager empty " +
      "after repeated invocations") {
    spark.catalog.clearCache()
    assert(cacheManagerIsEmpty, "precondition: cache cleared")
    val nodes = (0L to 30L).toDF("id")
    val edges = (0L until 30L).map(i => (i, (i * 7 + 1) % 31))
      .toDF("src", "dst")
    (1 to 2).foreach { _ =>
      graft.graph.PageRank.pageRank(nodes, "id", edges, "src", "dst",
        iters = 3).collect()
      graft.graph.Hits.hits(nodes, "id", edges, "src", "dst",
        iters = 3).collect()
      graft.graph.Communities.minLabelPropagation(nodes, "id", edges,
        "src", "dst", rounds = 3).collect()
      graft.graph.Communities.minLabelPropagation(nodes, "id", edges,
        "src", "dst", rounds = 40, earlyStop = true).collect()
      graft.llm.Dedup.resolveComponents(nodes.toDF("id"),
        edges.select(col("src").as("id_a"), col("dst").as("id_b")),
        "id").collect()
    }
    assert(cacheManagerIsEmpty,
      "an iterative operator left persisted round state in the " +
        "CacheManager — release the final round after materializing")
  }
}
