package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Out-of-fold (K-fold) mean target encoding — the standard tabular-ML
  * categorical feature with the leakage guard built in: each row's
  * encoding uses ONLY rows outside its own fold, so the feature never
  * sees the row's own target (the CatBoost/Kaggle "OOF target
  * encoding" recipe, here as a relation).
  *
  *   enc(row) = (S_c − S_cf + m · prior_f) / (N_c − N_cf + m)
  *   prior_f  = (S − S_f) / (N − N_f)          (out-of-fold global mean)
  *
  * where S_c/N_c are the category's target sum/count, S_cf/N_cf the
  * category×fold portion being excluded, and m the smoothing weight
  * pulling rare categories toward the prior.
  *
  * Folds are `pmod(idCol, k)` — deterministic, engine-portable, and
  * stratification-free by design (document the id column's entropy).
  * Distribution shape: ONE (category, fold) aggregate (everything else
  * derives from it), broadcast back to the row scan — a map-side join;
  * no shuffle of the fact rows at all.
  */
object TargetEncode {

  /** Adds `fold` and `target_enc` to `df`. */
  def oofTargetEncode(df: DataFrame, idCol: String, category: String,
                      target: String, k: Int = 5,
                      smoothing: Double = 10.0): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    require(smoothing >= 0.0, s"smoothing=$smoothing must be >= 0")
    val rows = df.withColumn("fold", pmod(col(idCol), lit(k.toLong)))
    // NULL-target rows receive an encoding but contribute to neither
    // sums nor counts (count(target), not count(*) — otherwise a
    // category with NULL targets is silently biased toward zero);
    // an all-NULL (category, fold) cell keeps its row via coalesce
    val cf = rows.groupBy(col(category).as("__c"), col("fold"))
      .agg(coalesce(sum(col(target)), lit(0.0)).as("__scf"),
        count(col(target)).as("__ncf"))
    val c = cf.groupBy("__c")
      .agg(sum("__scf").as("__sc"), sum("__ncf").as("__nc"))
    val f = cf.groupBy("fold")
      .agg(sum("__scf").as("__sf"), sum("__ncf").as("__nf"))
    val g = cf.agg(sum("__scf").as("__s"), sum("__ncf").as("__n"))
    // the internal category joins must be null-safe too, or the NULL
    // group is lost before it ever reaches the output join
    val c2 = c.withColumnRenamed("__c", "__c2")
    val stats = cf.join(c2, col("__c") <=> col("__c2")).drop("__c2")
      .join(f, Seq("fold"))
      .crossJoin(g)
      .withColumn("__prior",
        (col("__s") - col("__sf")) / (col("__n") - col("__nf")))
      .select(col("__c"), col("fold"),
        ((col("__sc") - col("__scf") + lit(smoothing) * col("__prior"))
          / (col("__nc") - col("__ncf") + lit(smoothing)))
          .as("target_enc"))
    // null-SAFE category equality: a NULL category is its own group
    // and must not be silently dropped by the join
    rows.join(broadcast(stats),
      rows(category) <=> stats("__c") && rows("fold") === stats("fold"))
      .drop(stats("fold")).drop("__c")
  }
}
