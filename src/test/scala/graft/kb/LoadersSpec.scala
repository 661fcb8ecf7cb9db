package graft.kb

import graft.SparkSpec
import graft.eval.Evaluator
import graft.fixtures.MicroCorpus
import graft.pipeline.T2KPipeline
import org.apache.spark.sql.functions._

/**
 * File-surface parity: load the REFERENCE'S OWN test resources
 * (/root/reference/src/test/resources) through our loaders and run the
 * full pipeline — the mappings must equal the micro-corpus goldens.
 * This is the "a reference user can switch" check at the file level.
 */
class LoadersSpec extends SparkSpec {
  import spark.implicits._

  private val res = "/root/reference/src/test/resources"
  private def available = new java.io.File(res).isDirectory

  test("csv line parser handles quotes and commas") {
    assert(Loaders.parseCsvLine("\"a,b\",c,\"d\"\"e\"") === Seq("a,b", "c", "d\"e"))
    assert(Loaders.parseCsvLine("x,,z") === Seq("x", "", "z"))
  }

  test("reference kbtables load with LOD semantics") {
    assume(available)
    val hierarchy = Loaders.loadClassHierarchy(spark, s"$res/ontology/ontology")
    assert(hierarchy.nonEmpty)
    // hierarchy entries are local names
    assert(hierarchy.exists(_ == ("Publisher", "Company")))
    val kb = Loaders.loadLodCsvDir(spark, s"$res/kbtables", Nil)
    assert(kb.rows.count() === 10)
    val props = kb.props.collect().map(_.getString(1))
    assert(props.contains("http://dbpedia.org/ontology/year"))
  }

  test("reference surface forms + redirects merge") {
    assume(available)
    val sf = Loaders.loadSurfaceForms(spark,
      Some(s"$res/surfaceform/SFs.txt"), Some(s"$res/redirect/redirects"))
    val pairs = sf.as[(String, String)].collect().toSet
    assert(pairs.contains(("gestern", "yesterday")))
    assert(pairs.contains(("gestern", "yst")))
    // redirect direction: "go away" redirects TO "day go"
    assert(pairs.contains(("day go", "go away")))
  }

  test("full pipeline over the reference's own fixture files = goldens") {
    assume(available)
    val docs = Loaders.loadWebTablesDir(spark, s"$res/webtables")
    assert(docs.count() === 12) // 2 headers + 10 rows
    val kb = Loaders.loadLodCsvDir(spark, s"$res/kbtables", Nil)
    val sf = Loaders.loadSurfaceForms(spark,
      Some(s"$res/surfaceform/SFs.txt"), Some(s"$res/redirect/redirects"))
    val result = T2KPipeline.run(docs, kb, sf, Map.empty)
    val gold = MicroCorpus.gsInstance.toDF("tableName", "rowNum", "uri")
    val prf = Evaluator.evaluate(
      result.instanceCorrs.select("tableName", "rowNum", "uri"), gold,
      Seq("tableName", "rowNum", "uri"))
    assert(prf.precision === 1.0 && prf.recall === 1.0, s"instance: $prf")
    val goldP = MicroCorpus.gsProperty.toDF("tableName", "colIdx", "propUri")
    val predP = result.schemaCorrs
      .join(kb.props.select($"propId", $"propUri"), "propId")
      .select("tableName", "colIdx", "propUri")
    val prfP = Evaluator.evaluate(predP, goldP, Seq("tableName", "colIdx", "propUri"))
    assert(prfP.precision === 1.0 && prfP.recall === 1.0, s"schema: $prfP")
  }
}
