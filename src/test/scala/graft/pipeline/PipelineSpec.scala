package graft.pipeline

import graft.SparkSpec
import graft.eval.Evaluator
import graft.fixtures.MicroCorpus
import graft.kb.{CandidateIndex, KbIngest}
import graft.model.SpanCodec
import org.apache.spark.sql.functions._

/** End-to-end golden tests on the micro corpus (reference semantics from
  * src/test/resources fixtures; expected mappings per FIXTURES.md §3). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = MicroCorpus.docs(spark).cache()
  lazy val kb = KbIngest.fromLodTables(spark, MicroCorpus.lodTables, MicroCorpus.classHierarchy)
  lazy val sf = MicroCorpus.surfaceFormsDf(spark)
  lazy val hierarchy = MicroCorpus.classHierarchy.toMap
  lazy val result: T2KResult = T2KPipeline.run(docs, kb, sf, hierarchy)

  test("key detection finds reference key columns (Col0 / Col1)") {
    val keys = Keys.detect(SpanCodec.columns(docs)).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(keys("webtable1.csv") === 0) // WebTablesTest.java:33-34
    assert(keys("webtable2.csv") === 1)
  }

  test("candidate generation resolves surface forms and redirects") {
    val cells = SpanCodec.cells(docs)
    val keyCols = Keys.detect(SpanCodec.columns(docs))
    val index = CandidateIndex.build(kb.cells, sf)
    val cands = Candidates.generate(cells, keyCols, index, 50, 0.2)
    val best = cands.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"tableName", $"rowNum").orderBy($"score".desc, $"uri")))
      .filter($"rk" === 1)
      .select($"tableName", $"rowNum", $"uri").as[(String, Int, String)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    // surface form: "yesterday" -> Gestern; redirect: "go away" -> Day_Go
    assert(best(("webtable1.csv", 1)) === "http://dbpedia.org/resource/Gestern")
    assert(best(("webtable1.csv", 0)) === "http://dbpedia.org/resource/Day_Go")
    assert(best(("webtable2.csv", 0)) === "http://dbpedia.org/resource/University_Of_Mannheim")
  }

  test("fuzzy lookup (edit distance 1) links a typo'd key cell") {
    val cells = Seq(("webtableX.csv", 0, 0, "text", "uni mannheem", null: String))
      .toDF("tableName", "rowNum", "colIdx", "kind", "text", "mediaRef")
    val keyCols = Seq(("webtableX.csv", 0)).toDF("tableName", "colIdx")
    val index = CandidateIndex.build(kb.cells, sf)
    // exact-token refinement (th 0.7) loses the typo'd key...
    val exact = Candidates.generate(cells, keyCols, index, 50, 0.7)
    assert(exact.count() === 0)
    // ...the deletion-1 neighborhood join still links it
    val fuzzy = Candidates.generate(cells, keyCols, index, 50, 0.7, None, 1)
    val best = fuzzy.orderBy($"score".desc, $"uri").select("uri", "score")
      .as[(String, Double)].collect()
    assert(best.nonEmpty &&
      best.head._1 === "http://dbpedia.org/resource/University_Of_Mannheim")
    assert(best.head._2 === 0.999)
  }

  test("release() is a safe no-op on local masters (no pinned persists)") {
    // localCheckpoint blocks register nothing; the persist() fallback is
    // cluster-only, so `cached` must stay empty here and release() must
    // not disturb the result frames
    assert(result.cached.isEmpty)
    result.release()
    assert(result.classCorrs.count() > 0)
  }

  test("class decision assigns the right KB class per table") {
    val gold = MicroCorpus.gsClass.toDF("tableName", "className")
    val prf = Evaluator.evaluate(
      result.classCorrs.select("tableName", "className"), gold,
      Seq("tableName", "className"))
    assert(prf.precision === 1.0 && prf.recall === 1.0, s"class: $prf")
  }

  test("instance correspondences: P/R = 1.0 on micro gold standard") {
    val gold = MicroCorpus.gsInstance.toDF("tableName", "rowNum", "uri")
    val prf = Evaluator.evaluate(
      result.instanceCorrs.select("tableName", "rowNum", "uri"), gold,
      Seq("tableName", "rowNum", "uri"))
    assert(prf.precision === 1.0 && prf.recall === 1.0, s"instance: $prf")
  }

  test("schema correspondences: P/R = 1.0 on micro gold standard") {
    val gold = MicroCorpus.gsProperty.toDF("tableName", "colIdx", "propUri")
    val predicted = result.schemaCorrs
      .join(kb.props.select($"propId", $"propUri"), "propId")
      .select("tableName", "colIdx", "propUri")
    val prf = Evaluator.evaluate(predicted, gold, Seq("tableName", "colIdx", "propUri"))
    assert(prf.precision === 1.0 && prf.recall === 1.0, s"schema: $prf")
  }

  test("triples are emitted with LCWA flags and provenance") {
    val t = result.triples.cache()
    // non-key columns only: author (webtable1) + year (webtable2), 5 rows each
    assert(t.count() === 10)
    val known = t.filter(!$"isNew").count()
    assert(known === 10)
    // the micro corpus embeds ONE contradicting fact: web says Day_Go's
    // author is "clara west", the KB says "Steve Buckner" — LCWA must flag
    // exactly that triple as incorrect.
    assert(t.filter($"lcwaCorrect" && !$"isNew").count() === 9)
    val wrong = t.filter(!$"lcwaCorrect").collect()
    assert(wrong.length === 1 &&
      wrong.head.getAs[String]("subjectUri").endsWith("Day_Go"))
    // media cells never produce triples
    assert(t.filter($"objectValue".isNull).count() === 0)
  }

  test("determinism: two runs emit identical triple sets") {
    val r2 = T2KPipeline.run(docs, kb, sf, hierarchy)
    val cols = Seq("subjectUri", "predicateUri", "objectValue", "sourceTable", "sourceRow", "sourceCol")
    val a = result.triples.select(cols.map(col): _*)
    val b = r2.triples.select(cols.map(col): _*)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }
}
