package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Guards the committed reference-parity artifacts (the BENCH CSVs) against
 * drift: `q_reference_parity` gates the union artifact's P/R in
 * CORRECTNESS, and this spec pins the same numbers at test time so a
 * pipeline change that regenerates a weaker artifact fails fast.
 * Provenance + measurement chain: BENCH/reference_parity.md.
 */
class ParityArtifactsSpec extends SparkSpec {

  private val refCsv = "/root/reference/output/SF_schema_correspondences.csv"
  private val benchDir = new java.io.File("BENCH")
  private def available =
    new java.io.File(refCsv).isFile && benchDir.isDirectory

  private def pairsOf(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.as[(String, String)].collect().toSet
  }

  test("union parity artifact sits at the structural ceiling (R >= 0.90)") {
    assume(available)
    val ref = pairsOf(spark.read.csv(refCsv).select(col("_c0"), col("_c1")))
    val ours = pairsOf(spark.read.option("header", "true")
      .csv("BENCH/t2d_union_parity_correspondences.csv")
      .select(col("id1"), col("id2")))
    val tp = (ours & ref).size
    assert(ref.size === 183)
    assert(tp.toDouble / ref.size >= 0.90,
      s"union artifact recall ${tp.toDouble / ref.size} (tp=$tp)")
  }

  test("label-state 1:1 artifact keeps P and R above 0.84 vs the reference") {
    assume(available)
    val ref = pairsOf(spark.read.csv(refCsv).select(col("_c0"), col("_c1")))
    val ours = pairsOf(spark.read.option("header", "true")
      .csv("BENCH/t2d_labelstate_correspondences.csv")
      .select(col("id1"), col("id2")))
    val tp = (ours & ref).size
    assert(tp.toDouble / ours.size >= 0.84, s"precision ${tp.toDouble / ours.size}")
    assert(tp.toDouble / ref.size >= 0.84, s"recall ${tp.toDouble / ref.size}")
  }

  test("per-pair accounting artifact is complete and consistent") {
    assume(available)
    val acct = spark.read.option("header", "true")
      .csv("BENCH/t2d_parity_accounting.csv")
    assert(acct.count() === 183)
    val byStatus = acct.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 18 absent pairs are the verified-structural misses; anything
    // larger means a regression in matrix coverage
    assert(byStatus.getOrElse("absent_from_matrix", 0L) <= 18L, byStatus.toString)
    assert(byStatus.getOrElse("emitted", 0L) >= 160L, byStatus.toString)
  }
}
