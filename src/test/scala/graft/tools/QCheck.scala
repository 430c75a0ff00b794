package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: run registered queries by name against a testdata scale
  * directory and print row counts (`sbt "Test/runMain graft.tools.QCheck
  * q_ann_lsh ..."`). */
object QCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (q <- args) {
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(s"ROWS $q = $n")
    }
    spark.stop()
  }
}
