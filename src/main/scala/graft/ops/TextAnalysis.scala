package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * token counting, quality scoring, stopword-based language ID, and
 * rolling-hash document fingerprinting. All pure Column expressions
 * (whole-stage codegen; no UDFs) so a 100 TB scan stays CPU-bound in
 * Tungsten, not in closure dispatch.
 */
object TextAnalysis {

  /** Whitespace + BPE-ish tokenisation column (lowercase alnum runs). */
  def tokensCol(text: Column): Column =
    filter(split(lower(regexp_replace(text, "[^a-zA-Z0-9]+", " ")), " "),
      t => t =!= "")

  /** Character n-gram shingles over the normalised text (lowercased,
    * whitespace collapsed): the boundary-free near-dup unit — catches
    * word-reordering/concatenation dups that token sets miss. Pure
    * codegen (substr over a sequence literal), no UDF; texts shorter
    * than n yield no shingles. */
  def charShinglesCol(text: Column, n: Int): Column = {
    // explicit whitespace class, NOT \s: Java regex \s matches \x0B but
    // RE2 (the DuckDB oracle's engine) does not — the mirror must agree
    val s = lower(regexp_replace(text, "[ \\t\\n\\r\\f\\x0B]+", " "))
    when(length(s) >= n,
        transform(sequence(lit(0), length(s) - n), i => s.substr(i + 1, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document token count / char stats / punctuation + stopword ratios
    * and a composite quality score in [0,1]. */
  /** GPT-2-style pretokeniser: contractions, space-prefixed letter runs,
    * digit runs, punctuation runs (whitespace itself never counts). ASCII
    * classes + non-capturing groups only — valid and equivalent under
    * both java.util.regex and RE2, so an external oracle can recount with
    * the same literal pattern. */
  val BpeishPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val toks = tokensCol(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val nPunct = (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double")
    val stop = Stopwords.en
    val nStop = size(filter(toks, t => t.isin(stop: _*))).cast("double")
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_tokens_bpe",
        size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long"))
      .withColumn("avg_token_len",
        when(nTok > 0, (nChar - (nTok - 1)) / nTok).otherwise(0.0))
      .withColumn("punct_ratio", when(nChar > 0, nPunct / nChar).otherwise(0.0))
      .withColumn("stopword_ratio", when(nTok > 0, nStop / nTok).otherwise(0.0))
      .withColumn("quality_score",
        when(nTok === 0, 0.0).otherwise(
          least(nTok / 100.0, lit(1.0)) * 0.5 +
            (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) * 0.25 +
            least(col("stopword_ratio") * 4.0, lit(1.0)) * 0.25))
  }

  /** Stopword-vote language ID: per language, count stopword hits in the
    * token set; argmax wins (ties -> language code asc); no hits -> 'und'. */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val votes = Stopwords.byLang.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // argmax by (hits desc, lang asc): sort_array ascending on (hits, negLang)
    // -> take greatest struct; struct ordering is lexicographic on fields.
    val best = greatest(votes: _*)
    docs.withColumn("pred_lang",
      when(best.getField("hits") > 0, best.getField("lang")).otherwise("und"))
  }

  /** Rolling-hash fingerprint over the token sequence (chained xxhash64:
    * order-sensitive, overflow-free) — content-defined document identity
    * robust to whitespace/punctuation noise. */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokensCol(col(textCol))
    val fp = aggregate(toks, lit(0L), (acc, t) => xxhash64(acc, t))
    docs.withColumn("fingerprint", fp)
  }

  /**
   * Gopher/MassiveText-style repetition metrics over the tokenised text
   * (Rae et al. 2021 §A1.1, as commonly reimplemented): per document,
   *
   *  - `top_{n}gram_char_frac` (n in `topNs`): the largest character
   *    mass any single word n-gram accounts for — max over grams of
   *    count x gramCharLen, divided by the normalised text length
   *    (token chars + single separating spaces), capped at 1.0. Defined
   *    as the MAX of the product, so no most-frequent-gram tie-break is
   *    needed and the value is order-free.
   *  - `dup_{n}gram_char_frac` (n in `dupNs`): character mass of grams
   *    occurring 2+ times — sum of count x gramCharLen over duplicated
   *    grams / normalised length, capped at 1.0 (overlapping
   *    occurrences can overshoot; the standard approximation of the
   *    char-span-union definition).
   *
   * Documents with fewer than n tokens score 0.0 for that n.
   *
   * 100 TB shape: ONE pass over the text — every n's grams explode from
   * the same scan as n-tagged structs, so the document is read and
   * tokenised once for all five metrics (not once per n); one
   * (docId, n, gramHash) aggregation and one per-doc rollup, no joins.
   * The gram STRING exists only map-side inside the expression; the
   * exchange carries (docId, n, 8-byte hash, len, count). A 64-bit
   * collision merges two gram groups; the DuckDB oracle counts the gram
   * strings themselves, so a collision at verify scale fails the gate.
   */
  def repetition(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text",
                 topNs: Seq[Int] = Seq(2, 3, 4),
                 dupNs: Seq[Int] = Seq(5, 10)): DataFrame = {
    val allNs = (topNs ++ dupNs).distinct.sorted
    val base = docs.select(col(idCol).as("docId"),
        tokensCol(col(textCol)).as("toks"))
      .withColumn("totalLen",
        length(concat_ws(" ", col("toks"))).cast("double"))
    // explode cheap (n, startIdx) index structs, compute the gram AFTER
    // the explode: the per-row array holds two ints per window instead
    // of built strings, and the hash/length stream through codegen
    val idxType = "array<struct<n:int,i:int>>"
    val idxArrays = allNs.map { n =>
      when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => struct(lit(n).as("n"), i.cast("int").as("i"))))
        .otherwise(lit(null).cast(idxType))
    }
    val gram = concat_ws(" ",
      slice(col("toks"), col("p.i") + lit(1), col("p.n")))
    val counts = base
      .select(col("docId"), col("totalLen"), col("toks"),
        explode(concat(idxArrays.map(a =>
          coalesce(a, array().cast(idxType))): _*)).as("p"))
      .select(col("docId"), col("totalLen"), col("p.n").as("n"),
        xxhash64(gram).as("gh"), length(gram).as("glen"))
      .groupBy(col("docId"), col("n"), col("gh"))
      .agg(count(lit(1)).as("cnt"), first(col("glen")).as("glen"),
        first(col("totalLen")).as("totalLen"))
    val perN = counts.groupBy(col("docId"), col("n"))
      .agg(
        least(max(col("cnt") * col("glen")) / first(col("totalLen")), lit(1.0))
          .as("topv"),
        least(coalesce(sum(when(col("cnt") >= 2, col("cnt") * col("glen"))),
          lit(0L)) / first(col("totalLen")), lit(1.0)).as("dupv"))
    val aggs = topNs.map(n =>
        max(when(col("n") === n, col("topv"))).as(s"top_${n}gram_char_frac")) ++
      dupNs.map(n =>
        max(when(col("n") === n, col("dupv"))).as(s"dup_${n}gram_char_frac"))
    val metrics = perN.groupBy(col("docId")).agg(aggs.head, aggs.tail: _*)
    val out = base.select(col("docId")).join(metrics, Seq("docId"), "left")
    val fracCols = topNs.map(n => s"top_${n}gram_char_frac") ++
      dupNs.map(n => s"dup_${n}gram_char_frac")
    fracCols.foldLeft(out) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0.0)))
    }.withColumnRenamed("docId", idCol)
  }
}

object Stopwords {
  val en: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "at", "by", "this")
  val de: Seq[String] = Seq("der", "die", "das", "und", "oder", "von", "zu",
    "im", "ist", "es", "dass", "fur", "auf", "mit", "als", "bei", "ein", "eine")
  val fr: Seq[String] = Seq("le", "la", "les", "et", "ou", "de", "des", "du",
    "est", "il", "que", "pour", "sur", "avec", "dans", "par", "un", "une")
  val es: Seq[String] = Seq("el", "los", "las", "y", "o", "de", "del",
    "es", "que", "para", "sobre", "con", "en", "por", "un", "una", "se", "su")
  val byLang: Map[String, Seq[String]] =
    Map("en" -> en, "de" -> de, "fr" -> fr, "es" -> es)
}
