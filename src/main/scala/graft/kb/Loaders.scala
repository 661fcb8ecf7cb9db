package graft.kb

import graft.model.{Doc, Dtype, Span}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-format loaders matching the reference's on-disk inputs
 * (SURVEY.md §2.1 S2-S4, S8):
 *
 *  - LOD-CSV class tables (KnowledgeBase.load, KnowledgeBase.java:122-305):
 *    4 header rows (names, property URIs, XSD types, ranges), col 0 = URI,
 *    col 1 must be rdfs:label, "{a|b}" multi-values, "NULL" nulls;
 *  - class-hierarchy TSV (loadClassHierarchy, KnowledgeBase.java:307-318);
 *  - surface forms + redirects (SurfaceForms.java:81-181);
 *  - gold-standard CSV (leftId, rightId, true/false);
 *  - web-table CSVs -> interleaved docs shape (WebTables.java:119-219).
 *
 * Header rows are tiny (4 per class file, ~hundreds of files) and read on
 * the driver; DATA rows are read distributed (data rows are identified by
 * col0 being an entity URI, so no order dependence on the CSV split).
 */
object Loaders {
  private val OwlThing = "http://www.w3.org/2002/07/owl#Thing"

  private def stripExt(name: String): String =
    name.replaceAll("\\.csv(\\.gz)?$", "")

  /** One LOD class file -> long form (className, propUri, propHeader, uri,
    * rawValue); None if col 1 is not rdfs:label. */
  private def lodFileLongForm(spark: SparkSession, path: String,
                              className: String): Option[DataFrame] = {
    val head = spark.read.option("quote", "\"").csv(path).limit(4).collect()
    if (head.length < 4) return None
    val headers = head(0).toSeq.map(v => Option(v).map(_.toString).orNull)
    val propUris = head(1).toSeq.map(v => Option(v).map(_.toString).orNull)
    if (!propUris.lift(1).contains(Dtype.RdfsLabelUri)) return None
    // duplicate-propUri collapse: LAST column per propUri wins (label twin)
    val keepCols = propUris.zipWithIndex.drop(1)
      .groupBy(_._1).map(_._2.last._2).toSet
    val df = spark.read.option("quote", "\"").csv(path)
      .filter(col("_c0").startsWith("http") && col("_c0") =!= OwlThing)
    val perCol = (1 until propUris.length).filter(keepCols).map { c =>
      df.select(lit(className).as("className"),
        lit(propUris(c)).as("propUri"),
        lit(headers(c)).as("propHeader"),
        col("_c0").as("uri"), col(s"_c$c").as("rawValue"))
        .filter(col("rawValue").isNotNull && col("rawValue") =!= "NULL")
    }
    perCol.reduceOption(_ unionByName _)
  }

  /** S2: directory of LOD class CSVs -> ingested KB. */
  def loadLodCsvDir(spark: SparkSession, dir: String,
                    hierarchy: Seq[(String, String)]): KbIngest.Ingested = {
    val fs = new java.io.File(dir).listFiles()
      .filter(f => f.getName.matches(".*\\.csv(\\.gz)?$")).sortBy(_.getName)
    val parts = fs.flatMap(f =>
      lodFileLongForm(spark, f.getAbsolutePath, stripExt(f.getName)))
    require(parts.nonEmpty, s"no LOD class tables found under $dir")
    KbIngest.fromLongForm(spark, parts.reduce(_ unionByName _), hierarchy)
  }

  /** S3: TSV class<TAB>superclass (values may be quoted). */
  def loadClassHierarchy(spark: SparkSession, path: String): Seq[(String, String)] = {
    import spark.implicits._
    spark.read.option("sep", "\t").csv(path)
      .select(regexp_replace(col("_c0"), "\"", "").as("c"),
        regexp_replace(col("_c1"), "\"", "").as("p"))
      .as[(String, String)].collect().toSeq
      .map { case (c, p) => (uriLocalName(c), uriLocalName(p)) }
  }

  /** Class names in hierarchy files are full URIs; class table names are
    * file names — normalise to the URI local name. */
  def uriLocalName(uri: String): String =
    uri.substring(uri.lastIndexOf('/') + 1)

  /** S4: surface forms "label<TAB>sf1<TAB>sf2..." plus redirects
    * "alias<TAB>target" (note the reversed direction) -> (label, surfaceForm). */
  def loadSurfaceForms(spark: SparkSession, sfPath: Option[String],
                       redirectPath: Option[String]): DataFrame = {
    val session = spark
    import session.implicits._
    val sf = sfPath.map { p =>
      spark.read.text(p).select(split(col("value"), "\t").as("f"))
        .select(col("f").getItem(0).as("label"),
          explode(expr("slice(f, 2, size(f) - 1)")).as("surfaceForm"))
    }
    val rd = redirectPath.map { p =>
      spark.read.text(p).select(split(col("value"), "\t").as("f"))
        .filter(size(col("f")) >= 2)
        .select(col("f").getItem(1).as("label"),
          col("f").getItem(0).as("surfaceForm"))
    }
    (sf.toSeq ++ rd.toSeq).reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(String, String)].toDF("label", "surfaceForm"))
  }

  /** S8: gold standard CSV (leftId, rightId, true/false). */
  def loadGoldStandard(spark: SparkSession, path: String): DataFrame =
    spark.read.csv(path).select(col("_c0").as("leftId"),
      col("_c1").as("rightId"),
      coalesce(col("_c2") === "true", lit(true)).as("isPositive"))

  /**
   * S1 file surface: a directory of web-table CSVs (first row = header)
   * re-encoded as the interleaved docs table. Small per-file headers are
   * read on the driver; tables themselves stream through the CSV reader.
   */
  def loadWebTablesDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv")).sortBy(_.getName)
    val docs = files.toSeq.flatMap { f =>
      val rows = scala.io.Source.fromFile(f, "UTF-8").getLines()
        .map(parseCsvLine).toVector
      if (rows.isEmpty) Nil
      else {
        val header = Doc(s"${f.getName}#h",
          rows.head.zipWithIndex.map { case (h, i) => Span("header", h, null, i) })
        val data = rows.tail.zipWithIndex.map { case (r, k) =>
          Doc(s"${f.getName}#r$k",
            r.zipWithIndex.map { case (v, i) =>
              Span("text", if (v == null || v.isEmpty) null else v, null, i)
            })
        }
        header +: data
      }
    }
    docs.toDS().toDF()
  }

  /** Minimal RFC-4180-ish line parser (quotes + commas). Driver-side only,
    * used for the small test-corpus files. */
  private[kb] def parseCsvLine(line: String): Seq[String] = {
    val out = collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { sb += '"'; i += 1 }
        else if (c == '"') inQ = false
        else sb += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString; sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    out += sb.toString
    out.toSeq
  }
}
