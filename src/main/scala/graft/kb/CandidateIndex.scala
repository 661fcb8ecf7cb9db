package graft.kb

import graft.text.Normalize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Spark-native replacement for the reference's Lucene entity index
 * (/root/reference .../t2k/index/dbpedia/DBpediaIndexer.java:41-86): one
 * searchable name per entity label PLUS one per surface form of the
 * normalised label (DBpediaIndexer.java:67-70). The Lucene TF-IDF top-N
 * lookup (DBPediaInstanceIndex.java:388-497) becomes an equi-join on
 * tokens with IDF weights precomputed per token (SURVEY.md §2.2 B1/B2).
 *
 * Scale design: the index is a flat table bucketable by `token`; stop
 * tokens (document frequency above `dfCap`) are dropped — the same
 * effect Lucene's IDF scoring has on them, and the guard that keeps the
 * candidate join from exploding on Zipfian token distributions.
 */
object CandidateIndex {

  /** kbCells (long form) + surfaceForms(label, surfaceForm) ->
    * names(uri, classId, nameNorm, nameTokens). */
  def entityNames(kbCells: DataFrame, surfaceForms: DataFrame): DataFrame = {
    val labels = kbCells.filter(col("propId") === KbIngest.RdfsLabelPropId)
      .select(col("uri"), col("classId"),
        Normalize.normaliseCol(col("value")).as("labelNorm"))
      .filter(col("labelNorm").isNotNull)
    val sfNames = labels.join(
        surfaceForms.select(Normalize.normaliseCol(col("label")).as("labelNorm"),
          Normalize.normaliseCol(col("surfaceForm")).as("nameNorm")),
        Seq("labelNorm"))
      .select(col("uri"), col("classId"), col("nameNorm"))
    labels.select(col("uri"), col("classId"), col("labelNorm").as("nameNorm"))
      .unionByName(sfNames)
      .filter(col("nameNorm").isNotNull)
      .distinct()
  }

  /** names -> candidate_tokens(token, idf, uri, classId, nameId, nNameTok).
    * Token sets are distinct per name so Jaccard can be computed exactly
    * from shared-token counts in the lookup join. Names are carried as
    * 64-bit hashes — only name identity matters downstream, and hashed
    * keys keep the lookup join's shuffle rows narrow. */
  def build(kbCells: DataFrame, surfaceForms: DataFrame,
            dfCap: Long = 100000): DataFrame = {
    // persisted: the count() action below and the explode both consume it
    val names = entityNames(kbCells, surfaceForms)
      .withColumn("tokens", array_distinct(split(col("nameNorm"), " ")))
      .withColumn("nNameTok", size(col("tokens")))
      .withColumn("nameId", xxhash64(col("nameNorm")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = names.select(col("uri"), col("classId"), col("nameId"),
      col("nNameTok"), explode(col("tokens")).as("token"))
    val nNames = names.count().max(1L)
    val tokenDf = exploded.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .withColumn("idf", log(lit(nNames.toDouble + 1.0) / col("df")))
    exploded.join(tokenDf, "token")
      .select("token", "idf", "uri", "classId", "nameId", "nNameTok")
  }
}
