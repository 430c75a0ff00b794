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

  test("soundexBlockedPairs: finds the Smith/Smyth pair that " +
      "(length-bucket, prefix) blocking structurally misses, and the " +
      "exact distance rejects phonetic over-merges") {
    val names = Seq(("r1", "Smith"), ("r2", "Smyth"), ("r3", "Robert"),
      ("r4", "Rupert"), ("r5", "Miller"), ("r6", "Millar"))
      .toDF("rec", "name")
    val got = Phonetic.soundexBlockedPairs(names, "rec", "name",
        maxDist = 1)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // Smith/Smyth confirmed at distance 1 inside S530;
    // Miller/Millar at distance 1 inside M460;
    // Robert/Rupert SHARE R163 but distance 2 > 1 rejects the merge
    assert(got === Set(("r1", "r2", 1L), ("r5", "r6", 1L)))
    // the q_editdist blocking key misses Smith/Smyth: with a prefix
    // longer than the point of divergence (char 3), the two land in
    // different blocks and the pair is never even CANDIDATE-generated
    val edPairs = Dedup.editDistancePairs(names, "rec", "name",
        maxDist = 1, lenBucket = 50, prefixLen = 16)
      .select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!edPairs.contains(("r1", "r2")) &&
      !edPairs.contains(("r2", "r1")),
      "prefix blocking unexpectedly caught Smith/Smyth — the ER-tier " +
        "motivation for the phonetic key would be stale")
  }

  test("unionBlockedPairs: each key finds the pair the other " +
      "structurally misses, flags name the generating key(s), and the " +
      "confirm still rejects over-merges") {
    val names = Seq(("r1", "Smith"), ("r2", "Smyth"), ("r3", "Bart"),
      ("r4", "Barl"), ("r5", "Miller"), ("r6", "Millar"),
      ("r7", "Robert"), ("r8", "Rupert")).toDF("rec", "name")
    def rows(maxDist: Int) = Phonetic.unionBlockedPairs(
        names, "rec", "name", maxDist = maxDist, prefixLen = 3)
      .select("id_a", "id_b", "dist", "via_soundex", "via_prefix")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    // Smith/Smyth: prefix "Smi" vs "Smy" splits them — ONLY the
    // phonetic key (S530) generates the pair. Bart/Barl: the codes
    // diverge (B630 vs B640) — ONLY the "Bar" prefix generates it.
    // Miller/Millar: both keys agree. Robert/Rupert share R163 but
    // the exact distance (2) rejects the merge at maxDist = 1.
    assert(rows(1) === Set(
      ("r1", "r2", 1L, true, false),
      ("r3", "r4", 1L, false, true),
      ("r5", "r6", 1L, true, true)))
    // at maxDist = 2 the over-merge is admitted — via soundex only
    assert(rows(2).contains(("r7", "r8", 2L, true, false)))
    // the single-key legs really do miss their class: the planted
    // pairs are never CANDIDATE-generated, not merely rejected
    val sxOnly = Phonetic.soundexBlockedPairs(names, "rec", "name",
        maxDist = 1).select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!sxOnly.contains(("r3", "r4")),
      "soundex unexpectedly caught Bart/Barl — the union's prefix " +
        "leg would be stale")
    val pfOnly = Dedup.editDistancePairs(names, "rec", "name",
        maxDist = 1, lenBucket = 1, prefixLen = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pfOnly.contains(("r1", "r2")),
      "prefix blocking unexpectedly caught Smith/Smyth — the union's " +
        "soundex leg would be stale")
  }

  test("length sub-bucket (degenerate-corpus path): identical pair " +
      "set to the unbucketed join when B >= maxDist") {
    // names spanning several lengths inside shared codes, including a
    // cross-bucket pair (lengths 5 and 6 straddle a B=2 boundary)
    val names = Seq("Smith", "Smyth", "Smythe", "Miller", "Millar",
      "Mill", "Robert", "Rupert", "Lee", "Leigh")
      .zipWithIndex.map { case (n, i) => (s"r$i", n) }.toDF("rec", "name")
    def pairs(b: Int) = Phonetic.soundexBlockedPairs(
        names, "rec", "name", maxDist = 2, lenBucket = b)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val un = pairs(0)
    assert(un.nonEmpty, "fixture should confirm at least one pair")
    assert(pairs(2) === un, "B = maxDist must find the same pairs")
    assert(pairs(5) === un, "any B >= maxDist must find the same pairs")
    intercept[IllegalArgumentException] {
      Phonetic.soundexBlockedPairs(names, "rec", "name",
        maxDist = 2, lenBucket = 1)
    }
  }
}
