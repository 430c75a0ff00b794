package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Soundex vs the published NARA examples + edge cases. */
class PhoneticSpec extends SparkSpec {
  import spark.implicits._

  private def sdx(names: Seq[String]): Map[String, String] =
    names.toDF("name")
      .select(col("name"), Phonetic.soundex(col("name")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("the seven NARA reference codes") {
    val got = sdx(Seq("Robert", "Rupert", "Ashcraft", "Ashcroft",
      "Tymczak", "Pfister", "Honeyman"))
    assert(got("Robert") === "R163")
    assert(got("Rupert") === "R163")
    assert(got("Ashcraft") === "A261", "h-transparency: S,C merge")
    assert(got("Ashcroft") === "A261")
    assert(got("Tymczak") === "T522", "vowel opacity: Z,K both kept")
    assert(got("Pfister") === "P236", "first-letter code merges P,F")
    assert(got("Honeyman") === "H555")
  }

  test("edge cases: case/punctuation-insensitive, short names padded, " +
      "letterless input is NULL") {
    val got = sdx(Seq("o'Brien", "OBRIEN", "Lee", "A", "Q"))
    assert(got("o'Brien") === got("OBRIEN"))
    assert(got("Lee") === "L000")
    assert(got("A") === "A000")
    assert(got("Q") === "Q000")
    val nulls = Seq("", "123", "!!").toDF("name")
      .select(Phonetic.soundex(col("name"))).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("blocking property: spelling variants share a key, distinct " +
      "surnames do not") {
    val got = sdx(Seq("Smith", "Smyth", "Schmidt", "Jackson", "Jaxon",
      "Miller"))
    assert(got("Smith") === got("Smyth"))
    assert(got("Smith") === got("Schmidt"),
      "the famous S530 collision — h-transparency merges C,M? no: " +
        "S,C merge and D,T merge, landing Schmidt on Smith's code")
    assert(got("Jackson") === got("Jaxon"))
    assert(got("Smith") !== got("Jackson"))
    assert(got("Smith") !== got("Miller")) // S530 vs M460
  }
}
