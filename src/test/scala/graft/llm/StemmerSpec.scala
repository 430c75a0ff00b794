package graft.llm

import graft.SparkSpec

/** Porter stemmer pinned against the worked examples in the 1980
  * paper (each step's illustration list). */
class StemmerSpec extends SparkSpec {

  test("step examples from the paper stem as published") {
    val cases = Seq(
      // step 1a
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      // step 1b (+ cleanup rules)
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl",
      "sized" -> "size", "hopping" -> "hop", "tanned" -> "tan",
      "falling" -> "fall", "hissing" -> "hiss", "fizzed" -> "fizz",
      "failing" -> "fail", "filing" -> "file",
      // step 1c
      "happy" -> "happi", "sky" -> "sky",
      // step 2
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "hesitanci" -> "hesit", "digitizer" -> "digit",
      "conformabli" -> "conform", "radicalli" -> "radic",
      "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "sensibiliti" -> "sensibl",
      // step 3
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope",
      "goodness" -> "good",
      // step 4
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "homologou" -> "homolog", "communism" -> "commun",
      "activate" -> "activ", "angulariti" -> "angular",
      "homologous" -> "homolog", "effective" -> "effect",
      "bowdlerize" -> "bowdler",
      // step 5
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    cases.foreach { case (in, exp) =>
      assert(Stemmer.stem(in) === exp, s"stem($in)")
    }
  }

  test("stemStats collapses inflections through the broadcast stem table") {
    import spark.implicits._
    val docs = Seq(
      (1L, "connect connected connecting connection connections"),
      (2L, "run running runs runner")).toDF("doc_id", "text")
    val out = Stemmer.stemStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_distinct_stems")))
      .toMap
    assert(out(1L)._1 === 5L)
    assert(out(1L)._2 === 1L,
      "all five connect-inflections must share one stem")
    assert(out(2L)._1 === 4L)
    // run/running/runs -> run; runner keeps its own stem (m=0 blocks
    // the er-rule, per the paper)
    assert(out(2L)._2 === 2L)
  }
}
