package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Fixed-size overlapping chunking vs a driver recompute. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[(Long, String)], chunk: Int, overlap: Int) =
    Chunking.chunkText(texts.toDF("doc_id", "text"), "doc_id", "text",
        chunk, overlap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3))))
      .toMap

  private def brute(texts: Seq[(Long, String)], chunk: Int,
                    overlap: Int): Map[(Long, Long), (Long, String)] = {
    val stride = chunk - overlap
    texts.filter(_._2.nonEmpty).flatMap { case (id, t) =>
      val toks = t.split(" ", -1)
      val n = toks.length
      val nc = if (n <= chunk) 1
        else math.ceil((n - overlap).toDouble / stride).toInt
      (0 until nc).map { i =>
        val s = i * stride
        val piece = toks.slice(s, math.min(s + chunk, n))
        (id, i.toLong) -> ((piece.length.toLong, piece.mkString(" ")))
      }
    }.toMap
  }

  private def doc(id: Long, n: Int): (Long, String) =
    id -> (1 to n).map(i => s"t$i").mkString(" ")

  test("matches the driver recompute across doc lengths incl. edges") {
    // lengths straddling every boundary: < chunk, == chunk, chunk+1,
    // exact multiple of stride + overlap, and a long doc
    val texts = Seq(doc(1, 3), doc(2, 8), doc(3, 9), doc(4, 14),
      doc(5, 100), doc(6, 1))
    val got = run(texts, chunk = 8, overlap = 2)
    assert(got === brute(texts, 8, 2))
  }

  test("every token position is covered and consecutive chunks " +
      "overlap by exactly `overlap` (except a short tail)") {
    val texts = Seq(doc(9, 57))
    val got = run(texts, chunk = 8, overlap = 2).toSeq
      .sortBy(_._1._2).map(_._2._2.split(" ").toSeq)
    val all = got.flatten.toSet
    assert(all === (1 to 57).map(i => s"t$i").toSet, "full coverage")
    got.sliding(2).foreach {
      case Seq(a, b) =>
        val shared = a.toSet & b.toSet
        assert(shared.size === 2, s"overlap: $a | $b")
      case _ =>
    }
  }

  test("short and empty docs: one chunk for n <= chunkTokens; empty " +
      "text emits nothing") {
    val got = run(Seq(doc(1, 5), 2L -> ""), chunk = 8, overlap = 2)
    assert(got.keySet === Set((1L, 0L)))
    assert(got((1L, 0L)) === ((5L, "t1 t2 t3 t4 t5")))
  }

  test("zero overlap degrades to disjoint fixed windows") {
    val got = run(Seq(doc(1, 20)), chunk = 5, overlap = 0)
    assert(got.size === 4)
    val texts = got.toSeq.sortBy(_._1._2).map(_._2._2)
    assert(texts.head === "t1 t2 t3 t4 t5")
    assert(texts.last === "t16 t17 t18 t19 t20")
    assert(texts.flatMap(_.split(" ")).distinct.size === 20)
  }
}
