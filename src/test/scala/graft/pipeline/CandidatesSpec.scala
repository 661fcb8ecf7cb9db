package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/**
 * Candidate-generation kernel invariants on adversarial fixtures the
 * micro corpus doesn't cover. Regression focus: the narrow-key exact leg
 * aggregates per NAME (nameId) and re-attaches uris afterwards — a
 * corpus where many entities SHARE a name (duplicate labels, shared
 * surface forms) must still score shared-token counts per name, not per
 * (name × uri occurrence), and every uri of a shared name must receive
 * the same score (R2's max-over-names semantics).
 */
class CandidatesSpec extends SparkSpec {
  import spark.implicits._

  private def keyCols = spark.createDataFrame(
    java.util.List.of[org.apache.spark.sql.Row](
      org.apache.spark.sql.Row("t", 0)),
    StructType(Seq(StructField("tableName", StringType),
      StructField("colIdx", IntegerType))))

  private def cellsOf(rows: (Int, String)*) = rows.toSeq
    .toDF("rowNum", "text")
    .select(lit("t").as("tableName"), col("rowNum"), lit(0).as("colIdx"),
      lit("text").as("kind"), col("text"),
      lit(null).cast("string").as("mediaRef"))

  /** index rows from (uri, classId, name) triples — one token row per
    * (uri, name, token), exactly like CandidateIndex.build output. */
  private def indexOf(names: (String, Int, String)*) = names.toSeq
    .toDF("uri", "classId", "name")
    .withColumn("toks", array_distinct(split(col("name"), " ")))
    .select(col("uri"), col("classId"),
      xxhash64(col("name")).as("nameId"),
      size(col("toks")).as("nNameTok"), explode(col("toks")).as("token"))
    .withColumn("idf", lit(1.0))

  test("shared names do not inflate shared-token counts (exact leg)") {
    // 40 uris share the label "alpha beta" — the per-name aggregation
    // must still see shared=2 (jaccard 1.0), not 2×40.
    val dupes = (1 to 40).map(i => (f"u$i%03d", 0, "alpha beta"))
    val index = indexOf(dupes :+ (("u900", 0, "alpha gamma")): _*)
    val out = Candidates.generate(cellsOf(0 -> "alpha beta"), keyCols, index,
      numCandidates = 100, simThreshold = 0.3)
      .select($"uri", $"score").as[(String, Double)].collect().toMap
    assert(out.size === 41)
    (1 to 40).foreach(i => assert(out(f"u$i%03d") === 1.0))
    // "alpha gamma": shared=1, jaccard 1/(2+2-1)
    assert(math.abs(out("u900") - 1.0 / 3.0) < 1e-12)
  }

  test("every uri of a shared name scores identically in the fuzzy leg") {
    val dupes = (1 to 7).map(i => (s"v$i", 0, "delta epsilon"))
    val index = indexOf(dupes: _*)
    // typo'd key: "delta epsilom" — ED-1 of epsilon; no exact hit at 0.5
    val out = Candidates.generate(cellsOf(0 -> "delta epsilom"), keyCols, index,
      numCandidates = 100, simThreshold = 0.5, maxEditDistance = 1)
      .select($"uri", $"score").as[(String, Double)].collect().toMap
    assert(out.size === 7)
    // both tokens within ED 1 → sharedFuzzy=2, jaccardFuzzy=1.0, ×0.999
    out.values.foreach(s => assert(math.abs(s - 0.999) < 1e-12))
  }

  test("max over an entity's multiple names (label + surface form)") {
    // u1 has two names; the better-matching one must win (R2 semantics)
    val index = indexOf(("u1", 0, "zeta eta theta"), ("u1", 0, "zeta eta"))
    val out = Candidates.generate(cellsOf(0 -> "zeta eta"), keyCols, index,
      numCandidates = 10, simThreshold = 0.1)
      .select($"uri", $"score").as[(String, Double)].collect().toMap
    assert(out.size === 1)
    assert(out("u1") === 1.0) // the exact surface form, not 2/3 via the label
  }

  test("retrieval rank uses only threshold-clearing names (IDF cut)") {
    // ADVICE r4: a sub-threshold name carrying the max idfSum must NOT
    // set its uri's retrieval rank — the per-name threshold applies
    // before the per-uri max(idfSum) (the Lucene-faithful reading: the
    // reference re-scores the retrieved name itself). u1's high-idf name
    // "gamma g1..g9" scores 1/12 < 0.3; under the pre-narrow-key
    // semantics its idfSum=50 would out-rank u2's 3 at the top-1 cut.
    val longTail = (1 to 9).map(i => s"g$i").mkString(" ")
    val index = indexOf(("u1", 0, "alpha"), ("u1", 0, s"gamma $longTail"),
        ("u2", 0, "alpha beta"))
      .withColumn("idf", coalesce(element_at(
        typedLit(Map("alpha" -> 1.0, "beta" -> 2.0, "gamma" -> 50.0)),
        col("token")), lit(0.1)))
    val out = Candidates.generate(cellsOf(0 -> "alpha beta gamma"), keyCols,
      index, numCandidates = 1, simThreshold = 0.3, rankByIdf = true)
      .select($"uri").as[String].collect().toSeq
    assert(out === Seq("u2"))
  }

  test("class filter prunes before scoring") {
    val index = indexOf(("a1", 1, "iota kappa"), ("a2", 2, "iota kappa"))
    val cpt = Seq(("t", 1)).toDF("tableName", "classId")
    val out = Candidates.generate(cellsOf(0 -> "iota kappa"), keyCols, index,
      numCandidates = 10, simThreshold = 0.4, classesPerTable = Some(cpt))
      .select($"uri").as[String].collect().toSet
    assert(out === Set("a1"))
  }
}
