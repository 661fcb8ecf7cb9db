package graft.triples

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TriplesSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalizer: scoped DBpedia property URIs collapse") {
    val uris = Seq(
      "http://dbpedia.org/ontology/PopulatedPlace/areaTotal",
      "http://dbpedia.org/ontology/areaTotal",
      "http://dbpedia.org/ontology/Building/floorCount",
      "http://example.org/other").toDF("uri")
    val aliases = Canonicalizer.dbpediaScopedPropertyAliases(uris, "uri")
    val aliasMap = aliases.as[(String, String)].collect().toMap
    assert(aliasMap("http://dbpedia.org/ontology/PopulatedPlace/areaTotal")
      === "http://dbpedia.org/ontology/areaTotal")
    assert(aliasMap("http://dbpedia.org/ontology/Building/floorCount")
      === "http://dbpedia.org/ontology/floorCount")
    assert(!aliasMap.contains("http://example.org/other"))
    val out = Canonicalizer.canonicalise(uris, aliases, "uri")
      .as[String].collect().toSet
    assert(out === Set("http://dbpedia.org/ontology/areaTotal",
      "http://dbpedia.org/ontology/floorCount", "http://example.org/other"))
  }

  test("graph sink: partitioned write + predicate-pruned read") {
    val triples = Seq(
      ("kb://e1", "kb://prop/a", "v1"), ("kb://e2", "kb://prop/a", "v2"),
      ("kb://e1", "kb://prop/b", "v3"))
      .toDF("subjectUri", "predicateUri", "objectValue")
    val dir = Files.createTempDirectory("graft_sink").toString
    GraphSink.write(triples, dir, subjectBuckets = 4)
    // layout: pred_part=<sanitised>/subj_bucket=<n>
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("pred_part="))
    assert(parts.length === 2, parts.mkString(","))
    val a = GraphSink.readPredicate(spark, dir, "kb://prop/a")
    assert(a.count() === 2)
    assert(a.select("subjectUri").as[String].collect().toSet === Set("kb://e1", "kb://e2"))
    // partition pruning: only the matching pred_part directory is scanned
    val scanned = a.queryExecution.executedPlan.toString
    assert(!scanned.contains("pred_part=kb_prop_b"))
  }
}
