package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Precision/recall/F1 of a correspondence set against a gold standard
 * (reference WInte.r MatchingEvaluator usage, T2KMatch.java:1034-1114;
 * standalone EvaluateCorrespondences.java:57-100).
 * Both inputs are DataFrames sharing join key columns; the gold standard
 * holds positives only (the micro corpus has no explicit negatives).
 */
object Evaluator {
  case class PRF(tp: Long, predicted: Long, gold: Long) {
    def precision: Double = if (predicted == 0) 0.0 else tp.toDouble / predicted
    def recall: Double = if (gold == 0) 0.0 else tp.toDouble / gold
    def f1: Double = {
      val p = precision; val r = recall
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
  }

  def evaluate(predicted: DataFrame, gold: DataFrame, keys: Seq[String]): PRF = {
    val p = predicted.select(keys.map(col): _*).distinct().cache()
    val g = gold.select(keys.map(col): _*).distinct().cache()
    val tp = p.join(g, keys, "left_semi").count()
    PRF(tp, p.count(), g.count())
  }
}
