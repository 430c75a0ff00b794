package graft.ensemble

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M8: hybrid ensemble — weighted mean of per-model z-score columns
  * (`src/run_hybrid.py:106-116`: equal-weight mean of STL/GP/LSTM
  * z-scores; notebook 03 variant: explicit weights). All scores live as
  * columns of ONE DataFrame (J5 is a projection, not a join —
  * SURVEY §2.3), so the combine is pure column arithmetic with
  * null-to-0 coalescing like np.nan_to_num (run_hybrid.py:104).
  */
object Hybrid {

  /** combined = Σ w_i·coalesce(score_i, 0) / Σ w_i */
  def combine(df: DataFrame, scores: Seq[(String, Double)],
              out: String = "combined_score"): DataFrame = {
    require(scores.nonEmpty)
    val wsum = scores.map(_._2).sum
    val num: Column = scores.map { case (c, w) =>
      coalesce(col(c), lit(0.0)) * lit(w)
    }.reduce(_ + _)
    df.withColumn(out, num / lit(wsum))
  }

  def combineEqual(df: DataFrame, scores: Seq[String],
                   out: String = "combined_score"): DataFrame =
    combine(df, scores.map(_ -> 1.0), out)

  /** Flag-level voting combiner: emit 1 where at least `minVotes` of the
    * member 0/1 flag columns agree (`minVotes = flags.size` is the
    * conjunction the reference's stored ensemble artifact uses —
    * `results/ensemble` has detected ≡ flags_bsts AND flags_gp;
    * `minVotes = 1` is the union). Null flags count as 0. */
  def voteFlags(df: DataFrame, flags: Seq[String], minVotes: Int,
                out: String = "detected"): DataFrame = {
    require(flags.nonEmpty && minVotes >= 1 && minVotes <= flags.size)
    val votes: Column = flags.map(c => coalesce(col(c), lit(0)))
      .reduce(_ + _)
    df.withColumn(out, when(votes >= minVotes, 1).otherwise(0))
  }
}
