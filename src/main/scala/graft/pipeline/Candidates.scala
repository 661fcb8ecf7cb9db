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

  /** Dictionary dim for re-attaching table names after the hot path:
    * (tableId = xxhash64(tableName), tableName), one row per table with a
    * detected key column — O(#tables), joined only against the top-N
    * SURVIVORS, never the aggregation volumes. The hot candidate shuffles
    * (token join, per-name groupBy, top-N window) key on the fixed 8-byte
    * id instead of the table-name string — the same dictionary-encoding
    * the KB side already uses (classId, nameId = xxhash64(nameNorm)), and
    * it accepts the same negligible birthday-collision odds (~n²/2⁶⁵ for
    * n tables; a collision would merge two tables' candidate row sets). */
  def tableDim(keyCols: DataFrame): DataFrame =
    keyCols.select(col("tableName")).distinct()
      .withColumn("tableId", xxhash64(col("tableName")))

  /** cells + keyCols -> one record per (row, distinct key token). Only the
    * 8-byte tableId, the token and the set size survive into the shuffle —
    * neither the key string nor the table-name string is needed downstream
    * (Jaccard is computed from counts; names re-attach via [[tableDim]]). */
  def keyTokens(cells: DataFrame, keyCols: DataFrame): DataFrame = {
    cells.join(keyCols, Seq("tableName", "colIdx"))
      .filter(col("kind") === "text")
      .select(xxhash64(col("tableName")).as("tableId"), col("rowNum"),
        Normalize.normaliseCol(col("text")).as("keyNorm"))
      .filter(col("keyNorm").isNotNull)
      .withColumn("keyTokens", array_distinct(split(col("keyNorm"), " ")))
      .withColumn("nKeyTok", size(col("keyTokens")))
      .select(col("tableId"), col("rowNum"), col("nKeyTok"),
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
   * Deletion-variant expansion of the index's DISTINCT TOKENS — a pure
   * function of the KB, built ONCE (and checkpointed next to
   * `candidate_tokens`) instead of re-expanded inside every `generate`
   * call. Token-level, not row-level: the ED-1 neighborhood of a Zipfian
   * corpus is bounded by |vocabulary|, so expanding VOCABULARY entries
   * (and equi-joining rows back through the verified token pairs) keeps
   * the fuzzy leg's shuffle at the exact leg's scale — the row-level
   * expansion put every occurrence of a hot token through the variant
   * join (165M-row blowups at sf0.1; the round-2 `variantTokenDfCap` silently
   * dropped hot shapes to survive, diverging from the uncapped oracle).
   *
   * Self-variants are kept unconditionally; deletion variants shared by
   * more than `variantTokenDfCap` DISTINCT tokens are dropped — at token
   * level the cap only triggers on degenerate vocabularies, so engine
   * and (uncapped) oracle agree at any realistic scale.
   */
  def variantIndex(candidateTokens: DataFrame, variantTokenDfCap: Long = 2000): DataFrame = {
    val toks = candidateTokens.select(col("token").as("idxToken")).distinct()
    val self = toks.select(col("idxToken"), col("idxToken").as("variant"))
    val del0 = toks.select(col("idxToken"),
      explode(deletions(col("idxToken"))).as("variant"))
    val delDf = del0.groupBy("variant").agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= variantTokenDfCap).drop("_df")
    self.unionByName(del0.join(delDf, "variant"))
  }

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
  /** Exact leg: Jaccard per (row, candidate name) from shared-token
    * counts. Names are pre-hashed 64-bit ids (CandidateIndex) — the
    * aggregation only needs name identity. With `withIdf`, also carries
    * sum(idf of shared tokens) — the Lucene-score analog used for the
    * retrieval cut.
    *
    * Shuffle shape (the engine's single biggest aggregation): the uri
    * string stays OUT of the token join and the per-name groupBy — rows
    * aggregate on (tableId, rowNum, classId, nameId, counts), the
    * per-name threshold is applied on the aggregated counts, and uris
    * are re-attached to the (much smaller) survivor set through the
    * (nameId, classId) name dim. Equivalent output: every uri sharing a
    * nameId has an identical token set, and a per-name score below
    * `simThreshold` can never lift a per-uri max past it. The retrieval
    * score (max idfSum per uri) is thereby computed over the names that
    * CLEAR the threshold — the Lucene-faithful reading (the reference
    * re-scores the retrieved name itself); measured output-identical on
    * the T2D selection (same rows, same gold coverage). */
  private def exactPerName(kt: DataFrame, candidateTokens: DataFrame,
                           classesPerTable: Option[DataFrame],
                           withIdf: Boolean,
                           saltHotTokenDf: Long,
                           simThreshold: Double): DataFrame = {
    // NAME-level distinct: candidateTokens carries one row per (uri,
    // name, token), and entities SHARING a name (surface forms, duplicate
    // labels) would multiply both the join output and — fatally — the
    // count(1) shared-token aggregate. Dedup to (name, token) rows: the
    // join and the aggregation then run at name-level volume, and the
    // uri fan-out happens once, on the thresholded survivors.
    val idxCols = Seq(col("classId"), col("nameId"), col("nNameTok"),
      col("token")) ++ (if (withIdf) Seq(col("idf")) else Nil)
    val idx = candidateTokens.select(idxCols: _*).distinct()
    // Explicit hot-token salting (opt-in): tokens whose index-side df
    // reaches the threshold join through Salt.skewSplitJoin — the index
    // rows spread across 8 salted partitions instead of one straggler.
    // Default off: CandidateIndex.dfCap already drops stop tokens and AQE
    // splits moderate skew; this is the guard for a corpus where even the
    // capped df concentrates in one executor's memory.
    val hits0 =
      if (saltHotTokenDf > 0L)
        graft.util.Salt.skewSplitJoin(idx, kt, "token", 8,
          saltHotTokenDf, Seq("nameId"))
      else kt.join(idx, "token")
    // No broadcast hint: classesPerTable is O(#tables) rows — at
    // millions of tables that's a multi-GB driver broadcast. AQE
    // decides; the left-semi is fine as a shuffle. `cpt` arrives
    // pre-encoded as (tableId, classId).
    val hits = classesPerTable match {
      case Some(cpt) => hits0.join(cpt, Seq("tableId", "classId"), "left_semi")
      case None => hits0
    }
    val aggs =
      if (withIdf) Seq(count(lit(1)).as("shared"), sum(col("idf")).as("idfSum"))
      else Seq(count(lit(1)).as("shared"))
    val scored = hits
      .groupBy(col("tableId"), col("rowNum"), col("classId"),
        col("nameId"), col("nNameTok"), col("nKeyTok"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("jaccard", col("shared").cast("double") /
        (col("nKeyTok") + col("nNameTok") - col("shared")).cast("double"))
      .filter(col("jaccard") >= simThreshold)
    val nameDim = candidateTokens
      .select("nameId", "classId", "uri").distinct()
    val outCols = Seq(col("tableId"), col("rowNum"), col("uri"),
      col("classId"), col("nameId"), col("nNameTok"), col("nKeyTok"),
      col("jaccard")) ++ (if (withIdf) Seq(col("idfSum")) else Nil)
    scored.join(nameDim, Seq("nameId", "classId")).select(outCols: _*)
  }

  /** Fuzzy (ED <= maxEditDistance) scores per (row, candidate name) for
    * the key-token rows in `kt` — the deletion-neighborhood join leg.
    * The fuzzy intersection is bounded by BOTH sides: countDistinct of
    * key tokens alone can exceed the matched index tokens (two key tokens
    * hitting one index token), pushing jaccardFuzzy past 1.0 and above a
    * true exact match. ED is verified with levenshtein (the neighborhood
    * intersection alone admits distance-2 pairs).
    *
    * Shuffle shape: the two countDistinct aggregates force a 3x expand,
    * so the aggregation runs on NARROW keys — (tableId, rowNum,
    * classId, nameId, counts), no uri or table-name string — with the per-name
    * threshold applied on the aggregated counts BEFORE uris are
    * re-attached through the (nameId, classId) name dim. Equivalent:
    * nameId = hash(nameNorm) means every uri sharing a name has an
    * identical token set (identical counts), and a per-name score below
    * `simThreshold` can never lift a per-uri max past it. Measured 2x on
    * the sf0.1 bench leg (3.4 s -> 1.3 s for the aggregation, and the
    * survivors entering the dim join drop from 1.79M to 77k). */
  private def fuzzyPerName(kt: DataFrame, candidateTokens: DataFrame,
                           classesPerTable: Option[DataFrame],
                           maxEditDistance: Int, variantTokenDfCap: Long,
                           variants: Option[DataFrame],
                           simThreshold: Double): DataFrame = {
    // 1) ED pairs at the DISTINCT-TOKEN level: key vocabulary x index
    // vocabulary through the shared deletion neighborhood, levenshtein-
    // verified (the neighborhood intersection alone admits distance-2
    // pairs). Bounded by vocabulary sizes, not corpus size.
    val kTok = kt.select(col("token")).distinct()
      .select(col("token").as("keyToken"),
        explode(concat(array(col("token")), deletions(col("token")))).as("variant"))
    // index side: prebuilt (checkpointed) when the caller has one — the
    // expansion is a pure function of the KB, so rebuilding it per call
    // wastes a full index scan + df-count shuffle every time.
    val idxv = variants.getOrElse(variantIndex(candidateTokens, variantTokenDfCap))
    val edPairs = kTok.join(idxv, "variant")
      .select("keyToken", "idxToken").distinct()
      .filter(col("keyToken") === col("idxToken") ||
        levenshtein(col("keyToken"), col("idxToken")) <= maxEditDistance)
    // 2) rows join through the verified pairs — two equi-joins at the
    // exact leg's scale; the variant fan-out never touches row payloads.
    // uri stays OUT of the hot join/aggregation (narrow-key shape above).
    val hits0 = kt.select(col("tableId"), col("rowNum"), col("nKeyTok"),
        col("token").as("keyToken"))
      .join(edPairs, "keyToken")
      .join(candidateTokens.select(col("classId"), col("nameId"),
        col("nNameTok"), col("token").as("idxToken")).distinct(), "idxToken")
    val hits = classesPerTable match {
      case Some(cpt) => hits0.join(cpt, Seq("tableId", "classId"), "left_semi")
      case None => hits0
    }
    val scored = hits
      .groupBy(col("tableId"), col("rowNum"), col("classId"),
        col("nameId"), col("nNameTok"), col("nKeyTok"))
      .agg(countDistinct(when(col("keyToken") === col("idxToken"),
        col("keyToken"))).as("shared"),
        least(countDistinct(col("keyToken")),
          countDistinct(col("idxToken"))).as("sharedFuzzy"))
      .withColumn("jaccardExact", col("shared").cast("double") /
        (col("nKeyTok") + col("nNameTok") - col("shared")).cast("double"))
      .withColumn("jaccardFuzzy", col("sharedFuzzy").cast("double") /
        (col("nKeyTok") + col("nNameTok") - col("sharedFuzzy")).cast("double"))
      .withColumn("jaccard",
        greatest(col("jaccardExact"), col("jaccardFuzzy") * 0.999))
      .filter(col("jaccard") >= simThreshold)
    val nameDim = candidateTokens
      .select("nameId", "classId", "uri").distinct()
    scored.join(nameDim, Seq("nameId", "classId"))
      .select(col("tableId"), col("rowNum"), col("uri"), col("classId"),
        col("nameId"), col("nNameTok"), col("nKeyTok"), col("jaccard"))
  }

  /**
   * Refinement pass DERIVED FROM the selection output instead of a second
   * full token join. This is a measured APPROXIMATION of the reference,
   * not an equivalence: the reference re-queries its index per row
   * (top-100, th 0.7, class-filtered, ~1 fuzzy terms appended to EVERY
   * query — CandidateRefinement.java:56-60, DBPediaInstanceIndex.java:
   * 84-87), while this pass (a) reuses selection's class-UNFILTERED
   * top-`selectionCandidates` cut, so a same-class exact candidate pushed
   * below that rank by other-class candidates is lost, and (b) runs the
   * fuzzy leg only for rows with NO surviving exact candidate >=
   * `simThreshold`, so hit rows never gain fuzzy-only candidates. Both
   * gaps were quantified on the shipped T2D corpus (BENCH/BASELINE.md
   * round-4 refinement-funnel note) and cost no gold recall there —
   * jaccard >= 0.7 candidates rank far above the 0.2 selection floor in
   * practice. The payoff: the variant join is proportional to the MISS
   * count and the exact token join is not repeated at all — on T2D this
   * replaced a 270-440 s stage with a 79 s one.
   */
  def refineFromSelection(selection: DataFrame, classesPerTable: DataFrame,
                          cells: DataFrame, keyCols: DataFrame,
                          candidateTokens: DataFrame,
                          numCandidates: Int, simThreshold: Double,
                          maxEditDistance: Int = 1, variantTokenDfCap: Long = 2000,
                          variants: Option[DataFrame] = None): DataFrame = {
    // Hot path runs on 8-byte tableIds (see tableDim); the checkpointed
    // selection and the class dim are encoded on entry, names re-attach
    // on the top-N survivors only.
    val cpt = classesPerTable
      .select(xxhash64(col("tableName")).as("tableId"), col("classId"))
    val filtered = selection
      .withColumn("tableId", xxhash64(col("tableName"))).drop("tableName")
      .join(cpt, Seq("tableId", "classId"), "left_semi")
    val exactHits = filtered.filter(col("score") >= simThreshold)
    val perUri =
      if (maxEditDistance <= 0) exactHits
      else {
        val hitRows = exactHits.select("tableId", "rowNum").distinct()
        val missKt = keyTokens(cells, keyCols)
          .join(hitRows, Seq("tableId", "rowNum"), "left_anti")
        val fuzzy = fuzzyPerName(missKt, candidateTokens, Some(cpt),
          maxEditDistance, variantTokenDfCap, variants, simThreshold)
          .groupBy(col("tableId"), col("rowNum"), col("uri"), col("classId"))
          .agg(max(col("jaccard")).as("score"))
          .filter(col("score") >= simThreshold)
        exactHits.select("tableId", "rowNum", "uri", "classId", "score")
          .unionByName(fuzzy)
      }
    val w = Window.partitionBy(col("tableId"), col("rowNum"))
      .orderBy(col("score").desc, col("uri").asc)
    perUri.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= numCandidates).drop("rk")
      .join(tableDim(keyCols), "tableId")
      .select("tableName", "rowNum", "uri", "classId", "score")
  }

  def generate(cells: DataFrame, keyCols: DataFrame, candidateTokens: DataFrame,
               numCandidates: Int, simThreshold: Double,
               classesPerTable: Option[DataFrame] = None,
               maxEditDistance: Int = 0, variantTokenDfCap: Long = 2000,
               variants: Option[DataFrame] = None,
               rankByIdf: Boolean = false,
               saltHotTokenDf: Long = 0L): DataFrame = {
    val kt = keyTokens(cells, keyCols)
    val cptEnc = classesPerTable.map(_
      .select(xxhash64(col("tableName")).as("tableId"), col("classId")))
    val perName =
      if (maxEditDistance <= 0) {
        exactPerName(kt, candidateTokens, cptEnc, rankByIdf,
          saltHotTokenDf, simThreshold)
      } else {
        // Fuzzy-on-miss: the exact leg runs for ALL rows; the deletion-
        // variant join runs ONLY for rows whose exact pass produced no
        // candidate >= simThreshold (the reference queries fuzzily to
        // recover rows the exact lookup loses — rows with an exact match
        // above the threshold keep their exact candidate set). This keeps
        // the expensive variant join proportional to the MISS count, not
        // the corpus.
        // Lazy lineage cut: the exact leg feeds both the miss-row filter
        // and the result union — cached at its first action, reclaimed by
        // the ContextCleaner (no CacheManager entry to leak across calls).
        // SERIALIZED storage: the default deserialized blocks are ~10x the
        // on-wire size and OOM'd a 32-thread 8g JVM on the T2D corpus
        // while the per-name aggregation was still running alongside.
        val exact = exactPerName(kt, candidateTokens, cptEnc,
          withIdf = false, saltHotTokenDf, simThreshold).localCheckpoint(false,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // exactPerName already applies the per-name threshold, so hit
        // rows are simply the rows with ANY surviving exact candidate
        val hitRows = exact.select("tableId", "rowNum").distinct()
        val missKt = kt.join(hitRows, Seq("tableId", "rowNum"), "left_anti")
        val fuzzy = fuzzyPerName(missKt, candidateTokens, cptEnc,
          maxEditDistance, variantTokenDfCap, variants, simThreshold)
        // union is exact-for-hit-rows ∪ fuzzy-for-miss-rows: the fuzzy leg
        // re-derives every exact share of a miss row through self-variants,
        // and its greatest() score dominates the exact leg's, so the
        // per-uri max below resolves the overlap for miss rows.
        exact.select("tableId", "rowNum", "uri", "classId", "nameId",
            "nNameTok", "nKeyTok", "jaccard")
          .unionByName(fuzzy.select("tableId", "rowNum", "uri", "classId",
            "nameId", "nNameTok", "nKeyTok", "jaccard"))
      }
    // R2: max over {label} ∪ surface forms. With rankByIdf the top-N cut
    // orders by the IDF-weighted retrieval score (rare shared tokens beat
    // stop-ish ones — Lucene TF-IDF parity, SURVEY §2.2 B2) while the
    // threshold keeps R1's WebJaccard semantics; score stays Jaccard.
    val uriAggs =
      if (rankByIdf && maxEditDistance <= 0)
        Seq(max(col("jaccard")).as("score"), max(col("idfSum")).as("retrieval"))
      else Seq(max(col("jaccard")).as("score"))
    val perUri = perName
      .groupBy(col("tableId"), col("rowNum"), col("uri"), col("classId"))
      .agg(uriAggs.head, uriAggs.tail: _*)
      .filter(col("score") >= simThreshold)
    val ordering =
      if (rankByIdf && maxEditDistance <= 0)
        Seq(col("retrieval").desc, col("score").desc, col("uri").asc)
      else Seq(col("score").desc, col("uri").asc)
    val w = Window.partitionBy(col("tableId"), col("rowNum"))
      .orderBy(ordering: _*)
    perUri.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= numCandidates).drop("rk")
      .join(tableDim(keyCols), "tableId")
      .select("tableName", "rowNum", "uri", "classId", "score")
  }
}
