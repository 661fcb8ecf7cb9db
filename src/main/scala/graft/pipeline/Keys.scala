package graft.pipeline

import graft.kb.KbIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Subject/key-column detection (SURVEY.md §2.10; reference
 * WebTables.java:153-155 via WInte.r Table.identifySubjectColumn):
 * leftmost string column with maximal value uniqueness. Deterministic
 * tie-break: (uniqueness desc, colIdx asc).
 *
 * Key correspondences map each table's key column to rdfs:label
 * (reference t2k/match/rules/WebTableKeyToRdfsLabelCorrespondenceGenerator
 * .java:50-56).
 */
object Keys {

  /** webCols -> (tableName, colIdx) of the key column per table. */
  def detect(webCols: DataFrame, minUniqueness: Double = 0.0): DataFrame = {
    val w = Window.partitionBy(col("tableName"))
      .orderBy(col("uniqueness").desc, col("colIdx").asc)
    webCols.filter(col("dtype") === "string" && col("uniqueness") >= minUniqueness)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("tableName"), col("colIdx"))
  }

  /** Key corrs: (tableName, colIdx, propId=rdfs:label, score=1.0). */
  def keyCorrs(keyCols: DataFrame): DataFrame =
    keyCols.select(col("tableName"), col("colIdx"),
      lit(KbIngest.RdfsLabelPropId).as("propId"), lit(1.0).as("score"))
}
