package graft.fixtures

import graft.model._
import graft.kb.LodTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deterministic micro corpus mirroring the reference's test resources
 * (/root/reference/src/test/resources/{webtables,kbtables,ontology,
 * surfaceform,redirect}) re-encoded in the interleaved documents shape
 * (FIXTURES.md §1/§3). One media span per web table exercises the
 * interleaved payload: preserved through the codec, invisible to matching.
 *
 * Semantics the corpus pins down:
 *  - "go away"   -> redirect -> entity Day_Go      (redirects file)
 *  - "yesterday" -> surface form of label "gestern" -> entity Gestern
 *  - "tomorrow"  -> surface form of label "morgen"  -> entity Morgen
 *  - webtable2 labels match kbtable2 labels exactly; key column is Col1.
 */
object MicroCorpus {

  // --- web tables (reference webtables/webtable{1,2}.csv) -----------------
  val webTable1Headers = Seq("name", "isdn", "author", "year")
  val webTable1Rows: Seq[Seq[String]] = Seq(
    Seq("go away", "1234", "clara west", "1989"),
    Seq("yesterday", "2321", "rachan thomas", "1968"),
    Seq("tomorrow", "8754", "manner thomas", "1985"),
    Seq("day after", "4562", "gold amber", "1945"),
    Seq("day before", "4561", "clara west", "1975"))

  val webTable2Headers = Seq("id", "university", "yearfounded")
  val webTable2Rows: Seq[Seq[String]] = Seq(
    Seq("1234", "uni mannheim", "1989"),
    Seq("2321", "uni heidelberg", "1968"),
    Seq("8754", "tu munich", "1985"),
    Seq("4562", "tu darmstadt", "1945"),
    Seq("4561", "free uni berlin", "1975"))

  private def tableDocs(name: String, headers: Seq[String], rows: Seq[Seq[String]],
                        mediaAt: Option[(Int, String)]): Seq[Doc] = {
    val headerDoc = Doc(s"$name#h",
      headers.zipWithIndex.map { case (h, i) => Span("header", h, null, i) })
    val rowDocs = rows.zipWithIndex.map { case (r, k) =>
      val base = r.zipWithIndex.map { case (v, i) => Span("text", v, null, i) }
      val spans = mediaAt match {
        case Some((row, ref)) if row == k =>
          base :+ Span("media", null, ref, r.length)
        case _ => base
      }
      Doc(s"$name#r$k", spans)
    }
    headerDoc +: rowDocs
  }

  def docs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (tableDocs("webtable1.csv", webTable1Headers, webTable1Rows,
        Some((0, "media://webtable1/img0"))) ++
      tableDocs("webtable2.csv", webTable2Headers, webTable2Rows,
        Some((1, "media://webtable2/img1"))))
      .toDS().toDF()
  }

  // --- KB tables (reference kbtables/kbtable{1,2}.csv, LOD-CSV shape) -----
  val kbTable1 = LodTable("kbtable1",
    headers = Seq("URI", "rdf-schema#label", "auhtorofbook"),
    propUris = Seq("URI", "http://www.w3.org/2000/01/rdf-schema#label",
      "http://dbpedia.org/ontology/PopulatedPlace/author"),
    xsdTypes = Seq("URI", "rdf-schema#Literal", "authorName"),
    rows = Seq(
      Seq("http://dbpedia.org/resource/Day_Go", "Day Go", "Steve Buckner"),
      Seq("http://dbpedia.org/resource/Day_After", "Day After", "Gold Amber"),
      Seq("http://dbpedia.org/resource/Day_Before", "Day Before", "Clara West"),
      Seq("http://dbpedia.org/resource/Morgen", "Morgen", "Manner Thomas"),
      Seq("http://dbpedia.org/resource/Gestern", "Gestern", "Rachan Thomas")))

  val kbTable2 = LodTable("kbtable2",
    headers = Seq("URI", "rdf-schema#label", "yearfounded"),
    propUris = Seq("URI", "http://www.w3.org/2000/01/rdf-schema#label",
      "http://dbpedia.org/ontology/year"),
    xsdTypes = Seq("URI", "rdf-schema#Literal", "yearFounded"),
    rows = Seq(
      Seq("http://dbpedia.org/resource/University_Of_Mannheim", "uni mannheim", "1989"),
      Seq("http://dbpedia.org/resource/University_Of_Heidelberg", "uni heidelberg", "1968"),
      Seq("http://dbpedia.org/resource/Technical_University_Of_Munich", "tu munich", "1985"),
      Seq("http://dbpedia.org/resource/Technical_University_Of_Darmstadt", "tu darmstadt", "1945"),
      Seq("http://dbpedia.org/resource/Free_University_Berlin", "free uni berlin", "1975")))

  def lodTables: Seq[LodTable] = Seq(kbTable1, kbTable2)

  /** class -> superclass edges; includes a superclass with no data file
    * (reference KnowledgeBase.java:272-289). */
  val classHierarchy: Seq[(String, String)] = Seq(
    "kbtable1" -> "Work", "kbtable2" -> "Organisation", "Work" -> "Thing")

  /** (label, surfaceForm): SFs.txt rows + redirects merged
    * (reference SurfaceForms.java:126-170). */
  val surfaceForms: Seq[(String, String)] = Seq(
    "gestern" -> "yesterday", "gestern" -> "yst",
    "morgen" -> "tomorrow", "morgen" -> "tmr",
    "day go" -> "go away")

  def surfaceFormsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    surfaceForms.toDF("label", "surfaceForm")
  }

  // --- gold standards ------------------------------------------------------
  val gsInstance: Seq[(String, Int, String)] = Seq(
    ("webtable1.csv", 0, "http://dbpedia.org/resource/Day_Go"),
    ("webtable1.csv", 1, "http://dbpedia.org/resource/Gestern"),
    ("webtable1.csv", 2, "http://dbpedia.org/resource/Morgen"),
    ("webtable1.csv", 3, "http://dbpedia.org/resource/Day_After"),
    ("webtable1.csv", 4, "http://dbpedia.org/resource/Day_Before"),
    ("webtable2.csv", 0, "http://dbpedia.org/resource/University_Of_Mannheim"),
    ("webtable2.csv", 1, "http://dbpedia.org/resource/University_Of_Heidelberg"),
    ("webtable2.csv", 2, "http://dbpedia.org/resource/Technical_University_Of_Munich"),
    ("webtable2.csv", 3, "http://dbpedia.org/resource/Technical_University_Of_Darmstadt"),
    ("webtable2.csv", 4, "http://dbpedia.org/resource/Free_University_Berlin"))

  val gsProperty: Seq[(String, Int, String)] = Seq(
    ("webtable1.csv", 0, "http://www.w3.org/2000/01/rdf-schema#label"),
    ("webtable1.csv", 2, "http://dbpedia.org/ontology/PopulatedPlace/author"),
    ("webtable2.csv", 1, "http://www.w3.org/2000/01/rdf-schema#label"),
    ("webtable2.csv", 2, "http://dbpedia.org/ontology/year"))

  val gsClass: Seq[(String, String)] = Seq(
    "webtable1.csv" -> "kbtable1", "webtable2.csv" -> "kbtable2")
}
