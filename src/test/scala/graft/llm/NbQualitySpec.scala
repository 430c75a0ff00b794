package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NbQualitySpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("separates the vocabularies it was trained on") {
    // curated docs speak one vocabulary, crawl docs another; held-out
    // docs of each style must land on their side of 0
    val rows = (0L until 20L).map(i =>
      (i, "wiki", "thorough referenced article prose encyclopedic")) ++
      (20L until 40L).map(i =>
        (i, "crawl", "click buy cheap deal spam winner")) ++
      Seq((100L, "crawl", "referenced encyclopedic prose"), // wiki-ish text
        (101L, "wiki", "cheap spam deal"))                  // crawl-ish text
    val r = NbQuality.nbQualityScore(docs(rows), "doc_id", "text",
        col("source") === "wiki", buckets = 4096)
      .collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Double]("nb_llr_mean"), x.getAs[Int]("is_quality")))
      .toMap
    (0L until 20L).foreach(i => assert(r(i)._2 == 1, s"doc $i"))
    (20L until 40L).foreach(i => assert(r(i)._2 == 0, s"doc $i"))
    // classification follows the TEXT, not the training label
    assert(r(100L)._2 == 1 && r(101L)._2 == 0)
    assert(r(100L)._1 > 0 && r(101L)._1 < 0)
  }

  test("deterministic under repartitioning (integer counts, ordered fold)") {
    val rng = new scala.util.Random(17)
    val vocab = (0 until 50).map(i => s"w$i")
    val rows = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) "good" else "bad",
        Seq.fill(12)(vocab(rng.nextInt(50))).mkString(" "))
    }
    val df = docs(rows)
    def run(d: org.apache.spark.sql.DataFrame) =
      NbQuality.nbQualityScore(d, "doc_id", "text",
          col("source") === "good", 256)
        .orderBy("doc_id").collect().toSeq
    assert(run(df) == run(df.repartition(9)))
  }

  test("shuffle-free map-only scorer is bit-identical to the joined form") {
    val rng = new scala.util.Random(23)
    val vocab = (0 until 80).map(i => s"tok$i")
    val rows = (0L until 50L).map { i =>
      (i, if (i % 4 == 0) "cur" else "raw",
        Seq.fill(10)(vocab(rng.nextInt(80))).mkString(" "))
    }
    val df = docs(rows)
    val joined = NbQuality.nbQualityScore(df, "doc_id", "text",
        col("source") === "cur", 512)
      .orderBy("doc_id").collect().toSeq
    val model = NbQuality.collectModel(
      NbQuality.train(df, "text", col("source") === "cur", 512))
    val mapOnly = NbQuality.scoreMapOnly(df, "doc_id", "text", model,
        512)
      .select(col("doc_id"), col("n_tokens"), col("nb_llr_mean"),
        col("is_quality"))
      .orderBy("doc_id").collect().toSeq
    assert(mapOnly == joined)
    // and the map-only plan is genuinely shuffle-free
    val p = NbQuality.scoreMapOnly(df, "doc_id", "text", model, 512)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"map-only scoring must not shuffle:\n$p")
  }

  test("n_tokens counts every token and rides the score row") {
    val rows = Seq((1L, "a", "x y z"), (2L, "b", "x"))
    val r = NbQuality.nbQualityScore(docs(rows), "doc_id", "text",
        col("source") === "a", 64)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Long]("n_tokens")).toMap
    assert(r == Map(1L -> 3L, 2L -> 1L))
  }
}
