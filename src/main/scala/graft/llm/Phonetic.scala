package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phonetic blocking keys for entity resolution — the record-linkage
  * companion to [[Dedup.editDistancePairs]]: block candidate pairs on
  * a phonetic code so "Smith"/"Smyth" land in one bucket without any
  * pair join, then confirm inside blocks with the exact edit
  * distance. American Soundex (NARA/US-Census variant), implemented
  * as a PURE column expression so it runs in the scan stage and is
  * reproducible verbatim by any SQL engine:
  *
  *  1. letters only, uppercased; empty → NULL code;
  *  2. keep the first letter; H/W are TRANSPARENT (removed before
  *     coding, so same-code letters separated by h/w merge) while
  *     vowels (AEIOUY) are OPAQUE separators (kept as '.' markers);
  *  3. consonant classes B F P V→1, C G J K Q S X Z→2, D T→3, L→4,
  *     M N→5, R→6 via `translate`;
  *  4. adjacent equal codes collapse (an ordered per-character fold —
  *     the charEntropy/rollingHash house pattern; backreference
  *     regexes are NOT engine-portable, RE2 has none);
  *  5. the first letter's own (possibly merged) code is dropped when
  *     the first letter is a coded consonant; pad/truncate to 3
  *     digits.
  *
  * Verified against the seven published NARA examples (Robert R163,
  * Rupert R163, Ashcraft A261, Ashcroft A261, Tymczak T522, Pfister
  * P236, Honeyman H555) on BOTH engines — PhoneticSpec pins them.
  */
object Phonetic {

  /** American Soundex code (e.g. 'R163'); NULL for names with no
    * letters. */
  def soundex(name: Column): Column = {
    val letters = upper(regexp_replace(name, "[^A-Za-z]", ""))
    val first = substring(letters, 1, 1)
    val coded = translate(translate(translate(letters, "HW", ""),
      "AEIOUY", "......"),
      "BFPVCGJKQSXZDTLMNR", "111122222222334556")
    val collapsed = aggregate(
      regexp_extract_all(coded, lit("(?s)."), lit(0)),
      lit(""),
      (acc, ch) => when(endswith(acc, ch), acc)
        .otherwise(concat(acc, ch)))
    val codes = translate(collapsed, ".", "")
    val tail3 = when(translate(first, "AEIOUYHW", "") === "",
      substring(codes, 1, 3)).otherwise(substring(codes, 2, 3))
    when(length(letters) === 0, lit(null).cast("string"))
      .otherwise(concat(first, rpad(tail3, 3, "0")))
  }

  /** The composed ER tier: Soundex BLOCKING feeding exact
    * edit-distance CONFIRMATION inside blocks — the end-to-end
    * record-linkage primitive ([[Dedup.editDistancePairs]] with the
    * phonetic key replacing the (length-bucket, prefix) key). The two
    * keys miss DIFFERENT pairs: a 16-char prefix block splits
    * Smith/Smyth at the third character, while S530 holds them
    * together. The phonetic key over-merges on its own — Robert and
    * Rupert share R163 at edit distance 2 — which is why the exact
    * distance confirms inside the block instead of trusting the code.
    *
    * Distribution shape: the code is a scan-stage pure expression (no
    * pair join to build blocks), candidates come from ONE equi-join on
    * the code, and the `|len(a)−len(b)| ≤ maxDist` levenshtein lower
    * bound prunes before the DP runs. Pair volume is Σ block², bounded
    * by the phonetic key space (≤ 26·7³ codes) times block density —
    * on real name data blocks are vocabulary-bounded; for a
    * degenerate corpus (every name one code) pass `lenBucket` ≥
    * maxDist to compose the editDistancePairs length sub-bucket INTO
    * the block key (same move as L96) — identical pair set, mega-
    * blocks split by length. Output: (block, id_a, id_b, name_a,
    * name_b, dist), id_a < id_b. */
  def soundexBlockedPairs(df: DataFrame, id: String, name: String,
                          maxDist: Int, lenBucket: Int = 0): DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist must be >= 0")
    require(lenBucket == 0 || lenBucket >= math.max(maxDist, 1),
      s"lenBucket=$lenBucket must be 0 (off) or >= maxDist — a " +
        "narrower bucket would hide pairs the distance allows")
    val keyed = df.select(col(id).cast("string").as("__id"),
        col(name).cast("string").as("__nm"))
      .withColumn("__code", soundex(col("__nm")))
      .filter(col("__code").isNotNull && col("__id").isNotNull)
    // optional L96-style length sub-bucket composed into the block
    // key for degenerate (single-code-dominated) corpora: the a-side
    // emits ⌊len/B⌋ ± 1 so every |Δlen| ≤ B pair is found exactly
    // once (only one of the three emissions equals b's own bucket);
    // with B ≥ maxDist the pair set is IDENTICAL to the unbucketed
    // join — the |Δlen| ≤ maxDist prune already rejects everything
    // the sub-bucket hides (PhoneticSpec pins the equality)
    val (a, b) =
      if (lenBucket == 0)
        (keyed.select(col("__code"), lit(0L).as("__lb"),
           col("__id").as("id_a"), col("__nm").as("name_a")),
         keyed.select(col("__code"), lit(0L).as("__lb"),
           col("__id").as("id_b"), col("__nm").as("name_b")))
      else {
        val lb = floor(length(col("__nm")) / lenBucket).cast("long")
        (keyed.select(col("__code"), explode(array(lb - 1, lb, lb + 1))
           .as("__lb"), col("__id").as("id_a"),
           col("__nm").as("name_a")),
         keyed.select(col("__code"), lb.as("__lb"),
           col("__id").as("id_b"), col("__nm").as("name_b")))
      }
    a.join(b, Seq("__code", "__lb"))
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("__code").as("block"), col("id_a"), col("id_b"),
        col("name_a"), col("name_b"), col("dist"))
  }

  /** Multi-blocking ER candidates — the standard recall recipe: UNION
    * the pair sets of TWO independent blocking keys (Soundex, and the
    * (length-bucket, `prefixLen`-char prefix) key of
    * [[Dedup.editDistancePairs]]), dedup on the pair, confirm with the
    * same exact edit distance. Each key misses pairs the other finds:
    * the prefix key splits an edit inside the first `prefixLen` chars
    * (Smith/Smyth at prefixLen ≥ 3; S530 holds them), while the
    * phonetic key splits any pair whose consonant skeleton diverges
    * past the code (Bart/Barl — B630 vs B640 — share the "Bar"
    * prefix). The recall contract of the union is the OR of the two
    * key contracts; PhoneticSpec plants one pair of each class.
    *
    * Because every leg confirms `dist ≤ maxDist` exactly (and
    * `|Δlen| ≤ maxDist` is implied by the distance), the union's pair
    * set has a closed form no blocking appears in:
    * `dist ≤ maxDist AND (code_a = code_b OR prefix_a = prefix_b)` —
    * which is what the SQL oracle states directly. Distribution
    * shape: two bucketed equi-joins (never all-pairs) and one
    * pair-keyed dedup aggregate; each leg keeps its own hot-key
    * story (soundexBlockedPairs' `lenBucket` escape hatch still
    * applies to the phonetic leg via [[soundexBlockedPairs]]).
    *
    * Output: (id_a, id_b, dist, via_soundex, via_prefix) with
    * id_a < id_b; the flags say which key(s) generated the pair. */
  def unionBlockedPairs(df: DataFrame, id: String, name: String,
                        maxDist: Int, prefixLen: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist must be >= 0")
    require(prefixLen >= 1, s"prefixLen=$prefixLen must be >= 1")
    val sx = soundexBlockedPairs(df, id, name, maxDist)
      .select(col("id_a"), col("id_b"), col("dist"),
        lit(true).as("via_soundex"), lit(false).as("via_prefix"))
    // the prefix leg: editDistancePairs' (len-bucket, prefix) key with
    // the bucket at maxDist — the |Δlen| ≤ bucket prune is then
    // implied by the confirm, so the leg's pair set is exactly
    // "prefix equal AND dist ≤ maxDist"
    val pf = Dedup.editDistancePairs(df, id, name, maxDist,
        lenBucket = math.max(maxDist, 1), prefixLen = prefixLen)
      .select(col("id_a"), col("id_b"), col("dist"),
        lit(false).as("via_soundex"), lit(true).as("via_prefix"))
    sx.unionByName(pf)
      .groupBy("id_a", "id_b")
      .agg(min("dist").as("dist"), // identical on both legs
        max("via_soundex").as("via_soundex"),
        max("via_prefix").as("via_prefix"))
  }
}
