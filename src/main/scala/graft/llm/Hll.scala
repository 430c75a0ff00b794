package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007) in
  * PURE relational form — the fixed-size companion to the KMV sketch
  * (L65): a KMV sketch is k longs per group; HLL is m bytes per group
  * and merges by per-bucket MAX, the cheapest possible mergeable
  * distinct summary for a 100 TB groupBy.
  *
  * DETERMINISTIC twist (the library's oracle contract, shared with
  * KMV): the hash is the engine-portable q_rollhash polynomial
  * (31-bit) pushed through a NONLINEAR xorshift-multiply finalizer —
  * both engines build the identical sketch and the ESTIMATE itself is
  * oracle-checkable. The finalizer matters here where KMV didn't:
  * sequential keys give the polynomial arithmetic-progression-like
  * values whose LEADING-ZERO statistics (what ρ measures) are wildly
  * non-geometric (observed: 300 sequential keys estimated as 84);
  * three xor-shift/multiply rounds break the linear structure
  * (estimates land inside the m=16 ±26% band; HllSpec pins both the
  * exactness and the band). All mixer arithmetic is exact int64 —
  * mirrored token-for-token in the oracle SQL.
  *
  * Sketch math, all exactly reproducible:
  *  - bucket j = h mod m; remainder r = ⌊h/m⌋ lives in [0, 2³¹/m);
  *  - ρ = (bit width of the remainder space) − bitlen(r) + 1, with
  *    bitlen via the engine-shared `bin()` string length (exact
  *    integer, no float log2);
  *  - the indicator sum S = Σ_j 2^(−M_j) uses 1/(1 << M_j): every
  *    term is an exact power of two and the 53-bit significand holds
  *    the full sum exactly (m ≤ 256, M_j ≤ 28 → span < 2⁵³), so S is
  *    order-independent and bit-identical on any engine;
  *  - raw estimate E = α_m·m²/S; small-range (E ≤ 2.5m, V empty
  *    buckets > 0) switches to linear counting m·ln(m/V) — the one ln
  *    in the operator (documented; the registered fixture stays in
  *    the raw regime).
  *
  * Plan shape: one (group, bucket) max aggregate — map-side
  * combinable, merge = MAX (the HLL merge law) — then one m-row-per-
  * group finisher. The exact-distinct reference column rides along as
  * the accuracy yardstick (not part of the scale path, same as KMV).
  */
object Hll {

  /** The xorshift-multiply finalizer (3 rounds, 31-bit): breaks the
    * polynomial's linear structure; every step exact in int64. */
  private def mix(c: Column): Column = {
    val s1 = c.bitwiseXOR(shiftright(c, 16))
    val m1 = (s1 * lit(73244475L)).bitwiseAND(lit(0x7FFFFFFFL))
    val s2 = m1.bitwiseXOR(shiftright(m1, 16))
    val m2 = (s2 * lit(73244475L)).bitwiseAND(lit(0x7FFFFFFFL))
    m2.bitwiseXOR(shiftright(m2, 16))
  }

  private def checkM(m: Int): Unit =
    require(m >= 4 && (m & (m - 1)) == 0, s"m=$m must be a power of 2 >= 4")

  /** Row-level (bucket, ρ) expressions over a value column — shared
    * by the batch sketch and the windowed streaming face. */
  private[graft] def bucketAndRho(value: Column, m: Int): (Column, Column) = {
    checkM(m)
    // remainder space width: 31-bit hash minus log2(m) bucket bits
    val restBits = 31 - Integer.numberOfTrailingZeros(m)
    val h = mix(TextAnalysis.rollingHash(value.cast("string")))
    val r = floor(h.cast("double") / lit(m.toDouble)).cast("long")
    val rho = when(r === 0, lit(restBits + 1))
      .otherwise(lit(restBits + 1) - length(bin(r)))
    (pmod(h, lit(m.toLong)), rho)
  }

  /** The sketch itself: per-group (bucket, max-ρ) rows — the relation
    * a caller persists or streams (see
    * `StreamingDetect.windowedHllMaxes`); merge law = per-bucket MAX,
    * applied automatically by [[estimateFromBuckets]]. */
  def bucketMaxes(df: DataFrame, group: String, value: String,
                  m: Int = 16): DataFrame = {
    val (bucket, rho) = bucketAndRho(col(value), m)
    df.filter(col(value).isNotNull)
      .select(col(group).as("group"), bucket.as("bucket"),
        rho.as("__rho"))
      .groupBy(col("group"), col("bucket"))
      .agg(max("__rho").as("mj"))
  }

  /** Finisher over a (group, bucket, mj) sketch relation. Safe to run
    * over a UNION of sketch increments — duplicate (group, bucket)
    * rows merge by MAX first, the sketch's merge law. Output:
    * (group, m, v_zero, s_sum, est_distinct). */
  def estimateFromBuckets(buckets: DataFrame, m: Int = 16): DataFrame = {
    checkM(m)
    val merged = buckets.groupBy("group", "bucket")
      .agg(max("mj").as("__mj"))
    val sketch = merged.groupBy("group")
      .agg(count(lit(1)).as("__nb"),
        // scala shiftleft() wants a literal distance — the SQL form
        // takes a column (same ShiftLeft expression underneath)
        sum(lit(1.0) /
          expr("CAST(shiftleft(1L, CAST(__mj AS INT)) AS DOUBLE)"))
          .as("__s1"))
      .withColumn("v_zero", lit(m.toLong) - col("__nb"))
      // empty buckets contribute 2^0 = 1 each — exact addition
      .withColumn("s_sum", col("__s1") + col("v_zero").cast("double"))
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) /
      col("s_sum")
    val est = when(raw <= lit(2.5 * m) && col("v_zero") > 0,
        lit(m.toDouble) *
          log(lit(m.toDouble) / col("v_zero").cast("double")))
      .otherwise(raw)
    sketch.select(col("group"), lit(m.toLong).as("m"), col("v_zero"),
      col("s_sum"), est.as("est_distinct"))
  }

  /** Per-group HLL sketch + estimate with the exact-distinct accuracy
    * reference riding along: (group, m, v_zero, s_sum, est_distinct,
    * exact_distinct). */
  def distinctSketch(df: DataFrame, group: String, value: String,
                     m: Int = 16): DataFrame = {
    val est = estimateFromBuckets(bucketMaxes(df, group, value, m), m)
    val exact = df.filter(col(value).isNotNull)
      .select(col(group).as("__xg"),
        col(value).cast("string").as("__v"))
      .distinct()
      .groupBy("__xg").agg(count(lit(1)).as("exact_distinct"))
    // null-SAFE group equality: a NULL group is its own group and
    // must not lose its exact reference to a null-blind join (the
    // TargetEncode convention)
    est.join(exact, est("group") <=> exact("__xg"), "left")
      .select(col("group").as(group), col("m"), col("v_zero"),
        col("s_sum"), col("est_distinct"),
        coalesce(col("exact_distinct"), lit(0L)).as("exact_distinct"))
  }
}
