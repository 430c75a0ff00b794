package graft.llm

import org.apache.spark.sql.Column
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
}
