package graft.pipeline

import graft.SparkSpec
import graft.fixtures.MicroCorpus
import graft.kb.KbIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DoubleType

/** Pins the round-5 exact-sum guarantee at CI level: the pipeline's score
  * aggregations accumulate in decimal(30,15) (associative, order-free), so
  * output must be BIT-identical — doubles compared via doubleToLongBits, not
  * epsilon — no matter how rows are laid out across partitions or how many
  * reducers merge the partial sums. The T2D-scale proof (local[8] ≡ local[32],
  * BENCH/BASELINE.md r5b) established this once; this spec guards it against
  * regressions, e.g. someone reverting a sum to double "for speed".
  *
  * Reference analog: a single-JVM engine (T2KMatch.java) is trivially
  * order-stable; a distributed engine has to EARN the same property. */
class DeterminismSpec extends SparkSpec {

  private lazy val kb = KbIngest.fromLodTables(
    spark, MicroCorpus.lodTables, MicroCorpus.classHierarchy)
  private lazy val sf = MicroCorpus.surfaceFormsDf(spark)
  private lazy val hierarchy = MicroCorpus.classHierarchy.toMap

  /** Canonical multiset of rows with doubles as raw bits (NaN-safe, -0.0
    * distinct from 0.0 — exactly the strictness we want here). */
  private def canon(df: DataFrame): Seq[String] = {
    val doubleIdx = df.schema.fields.zipWithIndex
      .collect { case (f, i) if f.dataType == DoubleType => i }.toSet
    df.collect().map { row =>
      row.toSeq.zipWithIndex.map {
        case (v: Double, i) if doubleIdx(i) =>
          java.lang.Double.doubleToLongBits(v).toString
        case (v, _) => String.valueOf(v)
      }.mkString("\u0001")
    }.toSeq.sorted
  }

  private def runWith(shufflePartitions: Int, inputParts: Int)
      : (Seq[String], Seq[String], Seq[String], Seq[String]) = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    try {
      val docs = MicroCorpus.docs(spark).repartition(inputParts)
      val r = T2KPipeline.run(docs, kb, sf, hierarchy)
      (canon(r.instanceCorrs), canon(r.schemaCorrs),
        canon(r.classCorrs), canon(r.triples))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("pipeline output is bit-identical across partition layouts") {
    // One narrow layout (single input partition, 2 reducers) vs a wide,
    // prime-count layout (11 input partitions, 13 reducers): partial-sum
    // merge order differs maximally between the two.
    val (i1, s1, c1, t1) = runWith(2, 1)
    val (i2, s2, c2, t2) = runWith(13, 11)
    assert(i1 === i2, "instance correspondences drifted across layouts")
    assert(s1 === s2, "schema correspondences drifted across layouts")
    assert(c1 === c2, "class correspondences drifted across layouts")
    assert(t1 === t2, "triples drifted across layouts")
    assert(i1.nonEmpty && s1.nonEmpty && c1.nonEmpty && t1.nonEmpty)
  }
}
