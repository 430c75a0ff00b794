package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the OPTIMIZE-style bin-pack rewrite next
  * to Z-order ([[Zorder]], cluster WITHIN files) and bucketing
  * ([[Bucketed]], co-locate ACROSS runs): rewrite a directory of many
  * small parquet files into ~`targetBytes` files. A 100 TB pipeline
  * that streams appends (one file per micro-batch per partition) hits
  * small-file death before any other layout problem: every downstream
  * scan pays one open/footer-read per file and the driver pays
  * O(files) listing/split planning.
  *
  * Spark-first mechanics: the scan itself is the bin-packer.
  * `FileSourceScanExec` packs input files into splits of at most
  * `spark.sql.files.maxPartitionBytes`, so reading with that conf set
  * to the TARGET file size and writing with NO shuffle emits exactly
  * one ~target-sized output file per packed split — each input file
  * is read once, no exchange, no driver-side file loop, and an
  * oversized input file is SPLIT across output files by the same
  * mechanism (also OPTIMIZE behavior). `openCostInBytes` is pinned to
  * 0 for the rewrite: its default (4 MB) models per-file open cost
  * for query scans and would cap packing at ~32 tiny files per split;
  * compaction reads every file exactly once either way, so pure
  * byte-packing is the correct cost model.
  *
  * Row-set equality is the whole contract (the q_salted / q_bucketed
  * convention): compaction must change the file layout and NOTHING
  * else — CompactSpec pins rows, schema, and the unchanged aggregate
  * plan; `q_compact` gates it against the plain-SQL oracle on the
  * uncompacted input.
  */
object Compact {

  /** before/after layout evidence for the probe logs. */
  final case class CompactStats(filesBefore: Long, bytesBefore: Long,
                                filesAfter: Long, bytesAfter: Long)

  private def dirStats(spark: SparkSession, dir: String): (Long, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(path).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (files.length.toLong, files.map(_.getLen).sum)
  }

  /** Rewrite the parquet at `inDir` into ~`targetBytes` files at
    * `outDir` (overwrite). Returns the layout before/after. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L << 20): CompactStats = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be > 0")
    val conf = spark.conf
    val prevMax = conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = conf.get("spark.sql.files.openCostInBytes")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
      conf.set("spark.sql.files.openCostInBytes", "0")
      // plan the scan UNDER the compaction confs (maxPartitionBytes is
      // read at scan planning time) and write straight through — the
      // split packing IS the bin-packing, no repartition/coalesce
      spark.read.parquet(inDir).write.mode("overwrite").parquet(outDir)
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
    val (fb, bb) = dirStats(spark, inDir)
    val (fa, ba) = dirStats(spark, outDir)
    CompactStats(fb, bb, fa, ba)
  }
}
