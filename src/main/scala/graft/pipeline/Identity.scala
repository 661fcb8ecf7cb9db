package graft.pipeline

import graft.kb.KbIngest
import graft.model.Dtype
import graft.text.{Normalize, Similarity}
import graft.util.Udfs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Identity resolution (SURVEY.md §2.2 B3 + §2.3 R9; reference
 * /root/reference .../t2k/match/blocking/CandidateBlocking.java:43-78 and
 * t2k/match/rules/DataTypeDependentRecordMatchingRule.java:80-167).
 *
 * Row-pair score = Σ simᵢ·wᵢ / Σ wᵢ over the table's schema
 * correspondences, where wᵢ = schema-corr score, EXCEPT the key column:
 * w = 5.0 and sim = 1/3·keyComparator (the candidate's surface-form-max
 * token Jaccard, carried in `candScore`) + 2/3·string comparator
 * (DataTypeDependentRecordMatchingRule.java:158-163,
 * IdentityResolution.java:77-99).
 *
 * Non-comparable pairs — either value missing, or the typed cast fails —
 * are excluded from BOTH numerator and denominator (the reference
 * comparators return -1 and are skipped,
 * DataTypeDependentRecordMatchingRule.java:93-104); the key column always
 * participates. Comparable non-key sims below the reference's per-value
 * comparator threshold 0.4 (IdentityResolution.java:77-96) are zeroed but
 * keep their weight; strings go through GSJ(0.5, 0.5) with its inner 0.5
 * jaccard floor. Keep score >= threshold (0.1).
 *
 * Shape: one flat join (candidates × schema corrs × web cell × KB value),
 * then a single hash aggregation — no nested correspondence graphs.
 */
object Identity {

  def resolve(candidates: DataFrame, schemaCorrs: DataFrame, keyCols: DataFrame,
              cells: DataFrame, kbCells: DataFrame, webCols: DataFrame,
              keyWeight: Double = 5.0, threshold: Double = 0.1,
              valueThreshold: Double = 0.4): DataFrame = {
    // keyCols/colMeta are O(#tables) dims — no forced broadcast (AQE picks).
    val corrs = schemaCorrs
      .join(keyCols.withColumn("isKey", lit(true)),
        Seq("tableName", "colIdx"), "left")
      .withColumn("isKey", coalesce(col("isKey"), lit(false)))
      .withColumn("w", when(col("isKey"), lit(keyWeight)).otherwise(col("score")))
      .select(col("tableName"), col("colIdx"), col("propId"), col("w"), col("isKey"))
    val colMeta = webCols
      .withColumn("yearRange",
        coalesce((col("maxYear") - col("minYear")).cast("double"), lit(1.0)))
      .select("tableName", "colIdx", "dtype", "yearRange")
    val webVals = cells.filter(col("kind") === "text")
      .select("tableName", "rowNum", "colIdx", "text")
    val kbVals = kbCells.select(col("uri"), col("propId"), col("value").as("kbValue"))

    val strSim = Udfs.gsjFast(Normalize.normaliseCol(col("text")),
      Normalize.normaliseCol(col("kbValue")))
    val aNum = graft.util.SafeCast.toDouble(col("text"))
    val bNum = graft.util.SafeCast.toDouble(col("kbValue"))
    val aDate = graft.util.SafeCast.toDateSafe(col("text"))
    val bDate = graft.util.SafeCast.toDateSafe(col("kbValue"))
    // null = non-comparable (reference compare() == -1, skipped entirely)
    val nullD = lit(null).cast("double")
    val typedSim =
      when(col("text").isNull || col("kbValue").isNull, nullD)
        .when(col("dtype") === Dtype.Numeric,
          when(aNum.isNotNull && bNum.isNotNull,
            Similarity.deviationSimCol(aNum, bNum)).otherwise(nullD))
        .when(col("dtype") === Dtype.Date,
          when(aDate.isNotNull && bDate.isNotNull,
            Similarity.weightedDateSimCol(aDate, bDate, col("yearRange")))
            .otherwise(nullD))
        .otherwise(strSim)

    val perCorr = candidates
      .select(col("tableName"), col("rowNum"), col("uri"), col("classId"),
        col("score").as("candScore"))
      .join(corrs, Seq("tableName"))
      .join(webVals, Seq("tableName", "rowNum", "colIdx"), "left")
      .join(kbVals, Seq("uri", "propId"), "left")
      .join(colMeta, Seq("tableName", "colIdx"), "left")
      .withColumn("rawSim", typedSim)
      // Multi-valued KB cells: best value counts (max ignores nulls; sim0
      // stays null only when NO comparable value exists for the pair).
      .groupBy(col("tableName"), col("rowNum"), col("uri"), col("classId"),
        col("candScore"), col("colIdx"), col("w"), col("isKey"))
      .agg(max(col("rawSim")).as("sim0"))
      // key: 1/3 key comparator + 2/3 string comparator, always counted;
      // non-key: drop non-comparable pairs, zero sims below valueThreshold.
      .filter(col("isKey") || col("sim0").isNotNull)
      .withColumn("sim", when(col("isKey"),
          col("candScore") / 3 + coalesce(col("sim0"), lit(0.0)) * 2 / 3)
        .otherwise(when(col("sim0") >= valueThreshold, col("sim0")).otherwise(0.0)))

    perCorr.groupBy(col("tableName"), col("rowNum"), col("uri"), col("classId"))
      .agg((sum(col("sim") * col("w")) / sum(col("w"))).as("score"))
      .filter(col("score") >= threshold)
  }
}
