package graft.pipeline

import graft.text.Normalize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Candidate generation / selection / refinement (SURVEY.md §2.2 B1-B2,
 * §2.3 R1-R3). Reference shape: per web row, look up the key-cell value in
 * the Lucene entity index, score candidates by WebJaccard against
 * {label} ∪ surfaceForms, keep top-N above a threshold
 * (/root/reference .../t2k/match/blocking/CandidateGenerationMultiKeyBlocker
 * .java:97-223, CandidateSelection.java:52-56 [N=50, th=0.2],
 * CandidateRefinement.java:56-60 [N=100, th=0.7, class-filtered]).
 *
 * Spark shape: the Lucene lookup is an equi-join on tokens against the
 * candidate-token table. Because both key values and index names carry
 * DISTINCT token sets with their sizes, the exact token-set Jaccard is
 * computed inside the aggregation (shared / (nKey + nName - shared)) — no
 * UDF, the whole path is joins + hash aggregation inside whole-stage
 * codegen. R2's "max over surface forms" is the final max() per (row, uri).
 *
 * Scale notes: the token join is the engine's biggest shuffle; the index
 * side drops stop tokens (CandidateIndex.dfCap), and candidates per row are
 * bounded by a window top-N so downstream fan-out is capped. The optional
 * class filter (refinement) is applied BEFORE the aggregation so pruned
 * classes never reach the shuffle.
 */
object Candidates {

  /** cells + keyCols -> one record per (row, distinct key token). Only the
    * token and the set size survive into the shuffle — the key string
    * itself is not needed downstream (Jaccard is computed from counts). */
  def keyTokens(cells: DataFrame, keyCols: DataFrame): DataFrame = {
    cells.join(keyCols, Seq("tableName", "colIdx"))
      .filter(col("kind") === "text")
      .select(col("tableName"), col("rowNum"),
        Normalize.normaliseCol(col("text")).as("keyNorm"))
      .filter(col("keyNorm").isNotNull)
      .withColumn("keyTokens", array_distinct(split(col("keyNorm"), " ")))
      .withColumn("nKeyTok", size(col("keyTokens")))
      .select(col("tableName"), col("rowNum"), col("nKeyTok"),
        explode(col("keyTokens")).as("token"))
  }

  /** Single-character deletions of a token (symdelete): two tokens are
    * within edit distance 1 iff (self ∪ deletions) intersect. Tokens
    * shorter than `minLen` are not expanded (they only match exactly),
    * bounding the fan-out the way Lucene's fuzzy rewrite effectively does
    * on short terms. Pure column expression (stays in codegen). */
  private def deletions(token: org.apache.spark.sql.Column,
                        minLen: Int = 4): org.apache.spark.sql.Column =
    when(length(token) < minLen, array().cast("array<string>")).otherwise(
      array_distinct(transform(sequence(lit(0), length(token) - 1),
        i => concat(token.substr(lit(1), i),
          token.substr(i + 2, length(token))))))

  /**
   * Generate scored candidates:
   * (tableName, rowNum, uri, classId, score) with score = max over entity
   * names of tokenJaccard(keyValue, name); top `numCandidates` per row with
   * score >= simThreshold. `classesPerTable` (tableName, classId) filters
   * the index side when present (refinement pass).
   *
   * `maxEditDistance = 1` (refinement parity: CandidateRefinement.java:57-60,
   * per-token `~1` fuzziness KeyIndexLookup.java:112-145) joins key tokens
   * to index tokens through deletion-1 neighborhoods and scores
   * greatest(exactJaccard, 0.999 × fuzzyJaccard): the reference retrieves
   * fuzzily and re-scores with exact WebJaccard, so exact matches must
   * always outrank typo matches, but a typo'd key cell whose tokens are
   * all within edit distance 1 still clears the refinement threshold.
   */
  def generate(cells: DataFrame, keyCols: DataFrame, candidateTokens: DataFrame,
               numCandidates: Int, simThreshold: Double,
               classesPerTable: Option[DataFrame] = None,
               maxEditDistance: Int = 0, variantDfCap: Long = 2000): DataFrame = {
    val kt = keyTokens(cells, keyCols)
    val perName =
      if (maxEditDistance <= 0) {
        val hits0 = kt.join(candidateTokens, "token")
        // No broadcast hint: classesPerTable is O(#tables) rows — at
        // millions of tables that's a multi-GB driver broadcast. AQE
        // decides; the left-semi is fine as a shuffle.
        val hits = classesPerTable match {
          case Some(cpt) => hits0.join(cpt.select("tableName", "classId"),
            Seq("tableName", "classId"), "left_semi")
          case None => hits0
        }
        // Exact Jaccard per (row, candidate name) from shared-token counts.
        // Names are pre-hashed 64-bit ids (CandidateIndex) — the
        // aggregation only needs name identity, and hashed keys keep
        // shuffle rows narrow.
        hits
          .groupBy(col("tableName"), col("rowNum"), col("uri"), col("classId"),
            col("nameId"), col("nNameTok"), col("nKeyTok"))
          .agg(count(lit(1)).as("shared"))
          .withColumn("jaccard", col("shared").cast("double") /
            (col("nKeyTok") + col("nNameTok") - col("shared")).cast("double"))
      } else {
        // key side (small): self + deletion variants
        val ktv = kt.select(col("tableName"), col("rowNum"), col("nKeyTok"),
          col("token").as("keyToken"),
          explode(concat(array(col("token")), deletions(col("token")))).as("variant"))
        // index side (the 10^9-entity side): self-variants are kept
        // unconditionally (the exact path), DELETION variants above the df
        // cap are dropped — hot deletion shapes ("ats" from cats/bats/rats)
        // otherwise degenerate the variant join into a quadratic bucket.
        val idxCols = Seq(col("uri"), col("classId"), col("nameId"),
          col("nNameTok"), col("token").as("idxToken"))
        val idxSelf = candidateTokens.select(idxCols :+ col("token").as("variant"): _*)
        val idxDel0 = candidateTokens.select(
          idxCols :+ explode(deletions(col("token"))).as("variant"): _*)
        val delDf = idxDel0.groupBy("variant").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= variantDfCap).drop("_df")
        val idxv = idxSelf.unionByName(idxDel0.join(delDf, "variant"))
        val hits0 = ktv.join(idxv, "variant")
        val hits = classesPerTable match {
          case Some(cpt) => hits0.join(cpt.select("tableName", "classId"),
            Seq("tableName", "classId"), "left_semi")
          case None => hits0
        }
        // verify ED <= maxEditDistance (neighborhood intersection alone
        // admits distance-2 pairs), dedup multi-variant matches, then
        // count matched DISTINCT key tokens (fuzzy) vs equal tokens (exact)
        hits
          .filter(col("keyToken") === col("idxToken") ||
            levenshtein(col("keyToken"), col("idxToken")) <= maxEditDistance)
          .groupBy(col("tableName"), col("rowNum"), col("uri"), col("classId"),
            col("nameId"), col("nNameTok"), col("nKeyTok"))
          .agg(countDistinct(when(col("keyToken") === col("idxToken"),
            col("keyToken"))).as("shared"),
            countDistinct(col("keyToken")).as("sharedFuzzy"))
          .withColumn("jaccardExact", col("shared").cast("double") /
            (col("nKeyTok") + col("nNameTok") - col("shared")).cast("double"))
          .withColumn("jaccardFuzzy", col("sharedFuzzy").cast("double") /
            (col("nKeyTok") + col("nNameTok") - col("sharedFuzzy")).cast("double"))
          .withColumn("jaccard",
            greatest(col("jaccardExact"), col("jaccardFuzzy") * 0.999))
      }
    // R2: max over {label} ∪ surface forms.
    val perUri = perName
      .groupBy(col("tableName"), col("rowNum"), col("uri"), col("classId"))
      .agg(max(col("jaccard")).as("score"))
      .filter(col("score") >= simThreshold)
    val w = Window.partitionBy(col("tableName"), col("rowNum"))
      .orderBy(col("score").desc, col("uri").asc)
    perUri.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= numCandidates).drop("rk")
  }
}
