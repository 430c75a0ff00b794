package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** io/Compact contract: the rewrite may change the FILE LAYOUT and
  * nothing else — fewer files (bin-packed to the target), identical
  * row set, identical schema, and the session's scan confs restored
  * afterwards (compaction must not leak its packing conf into later
  * queries).
  */
class CompactSpec extends SparkSpec {

  private val base = "/tmp/graft-compact-spec"

  private def fixture(nFiles: Int): String = {
    import spark.implicits._
    val dir = s"$base/in$nFiles"
    (0 until 10000).map(i => (i.toLong, i % 97, s"row-$i"))
      .toDF("id", "bucket", "payload")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("small files bin-pack into fewer target-sized files; row set " +
      "and schema are untouched") {
    val in = fixture(32)
    val out = s"$base/packed"
    val stats = Compact.compact(spark, in, out, targetBytes = 64L << 20)
    assert(stats.filesBefore == 32, s"fixture wrote ${stats.filesBefore}")
    assert(stats.filesAfter < 4,
      s"300 KB of input at a 64 MB target must pack to a handful of " +
        s"files, got ${stats.filesAfter}")
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    def shape(d: org.apache.spark.sql.DataFrame) =
      d.schema.fields.map(f => s"${f.name}:${f.dataType.sql}").sorted.toSeq
    assert(shape(a) === shape(b))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "bucket", "payload").collect()
        .map(_.mkString("|")).sorted.toSeq
    assert(rows(a) === rows(b))
  }

  test("an aggregate over the compacted copy equals the original — " +
      "equivalence is the contract") {
    val in = fixture(16)
    val out = s"$base/packed2"
    Compact.compact(spark, in, out, targetBytes = 64L << 20)
    def agg(dir: String) = spark.read.parquet(dir)
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(agg(in) === agg(out))
  }

  test("scan confs are restored after the rewrite (no leak into " +
      "later query planning)") {
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    Compact.compact(spark, fixture(4), s"$base/packed3",
      targetBytes = 1L << 20)
    assert(spark.conf.get("spark.sql.files.maxPartitionBytes") == prevMax)
    assert(spark.conf.get("spark.sql.files.openCostInBytes") == prevOpen)
  }

  test("targetBytes must be positive") {
    intercept[IllegalArgumentException] {
      Compact.compact(spark, s"$base/in4", s"$base/never", 0L)
    }
  }
}
