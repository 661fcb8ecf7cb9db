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
 * IdentityResolution.java:77-99). Missing values contribute sim 0 but
 * their weight stays in the denominator. Keep score >= threshold (0.1).
 *
 * Shape: one flat join (candidates × schema corrs × web cell × KB value),
 * then a single hash aggregation — no nested correspondence graphs.
 */
object Identity {

  def resolve(candidates: DataFrame, schemaCorrs: DataFrame, keyCols: DataFrame,
              cells: DataFrame, kbCells: DataFrame, webCols: DataFrame,
              keyWeight: Double = 5.0, threshold: Double = 0.1): DataFrame = {
    val corrs = schemaCorrs
      .join(broadcast(keyCols.withColumn("isKey", lit(true))),
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

    val strSim = Udfs.gsjRawFast(Normalize.normaliseCol(col("text")),
      Normalize.normaliseCol(col("kbValue")))
    val numSim = Similarity.deviationSimCol(
      graft.util.SafeCast.toDouble(col("text")), graft.util.SafeCast.toDouble(col("kbValue")))
    val dateSim = Similarity.weightedDateSimCol(
      graft.util.SafeCast.toDateSafe(col("text")), graft.util.SafeCast.toDateSafe(col("kbValue")),
      col("yearRange"))
    val typedSim =
      when(col("text").isNull || col("kbValue").isNull, 0.0)
        .when(col("dtype") === Dtype.Numeric, coalesce(numSim, lit(0.0)))
        .when(col("dtype") === Dtype.Date, coalesce(dateSim, lit(0.0)))
        .otherwise(coalesce(strSim, lit(0.0)))

    val perCorr = candidates
      .select(col("tableName"), col("rowNum"), col("uri"), col("classId"),
        col("score").as("candScore"))
      .join(corrs, Seq("tableName"))
      .join(webVals, Seq("tableName", "rowNum", "colIdx"), "left")
      .join(kbVals, Seq("uri", "propId"), "left")
      .join(broadcast(colMeta), Seq("tableName", "colIdx"), "left")
      .withColumn("rawSim", typedSim)
      // Multi-valued KB cells: best value counts.
      .groupBy(col("tableName"), col("rowNum"), col("uri"), col("classId"),
        col("candScore"), col("colIdx"), col("w"), col("isKey"))
      .agg(max(col("rawSim")).as("sim0"))
      .withColumn("sim", when(col("isKey"),
        col("candScore") / 3 + col("sim0") * 2 / 3).otherwise(col("sim0")))

    perCorr.groupBy(col("tableName"), col("rowNum"), col("uri"), col("classId"))
      .agg((sum(col("sim") * col("w")) / sum(col("w"))).as("score"))
      .filter(col("score") >= threshold)
  }
}
