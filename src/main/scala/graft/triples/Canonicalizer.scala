package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * URI canonicalisation (SURVEY.md §2.1 S9; reference
 * /root/reference .../EvaluateCorrespondences.java:57-100 +
 * Canonicalizer.java:40-71): rewrite equivalent URIs to a canonical form
 * before evaluation/materialisation, e.g.
 * dbpedia.org/ontology/PopulatedPlace/areaTotal ≡ …/ontology/areaTotal.
 *
 * Spark shape: left join against an alias->canonical map (broadcast; the
 * map is a dimension) + coalesce. Works for any URI column.
 */
object Canonicalizer {

  /** Built-in alias rule from the reference: class-scoped property URIs
    * collapse to their unscoped form (ontology/<Class>/<prop> -> ontology/<prop>). */
  def dbpediaScopedPropertyAliases(uris: DataFrame, uriCol: String): DataFrame = {
    val scoped = "^(https?://dbpedia\\.org/ontology)/[A-Z][^/]*/(.+)$"
    uris.select(col(uriCol).as("alias"),
        regexp_replace(col(uriCol), scoped, "$1/$2").as("canonical"))
      .filter(col("alias") =!= col("canonical"))
      .distinct()
  }

  /** Rewrite `uriCol` through the alias map (alias, canonical). */
  def canonicalise(df: DataFrame, aliasMap: DataFrame, uriCol: String): DataFrame = {
    val m = broadcast(aliasMap.select(col("alias"), col("canonical")))
    df.join(m, df(uriCol) === m("alias"), "left")
      .withColumn(uriCol, coalesce(col("canonical"), col(uriCol)))
      .drop("alias", "canonical")
  }
}
