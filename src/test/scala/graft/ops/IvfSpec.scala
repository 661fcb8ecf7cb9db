package graft.ops

import graft.SparkSpec

/** IVF ANN (SimSearch.trainCentroids / ivfTopK): reference analog is the
  * brief's "IVF or LSH-bucketed variant as the scale path" — both now
  * exist; IVF is the single-cell-per-vector alternative to the
  * multi-table LSH leg. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  // 8 well-separated clusters of 8 points in 16 dims (seeded).
  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 4f))
    (0 until 64).map { i =>
      val c = base(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    }.toDF("vec_id", "embedding").cache()
  }

  test("centroid training is deterministic across partition layouts") {
    val a = SimSearch.trainCentroids(vecs.repartition(1), "vec_id", "embedding",
      nCells = 8, iterations = 2)
    val b = SimSearch.trainCentroids(vecs.repartition(7), "vec_id", "embedding",
      nCells = 8, iterations = 2)
    assert(a.length === 8 && a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.toSeq === y.toSeq, "Lloyd means drifted across layouts")
    }
  }

  test("probing ALL cells reproduces brute force exactly") {
    val cents = SimSearch.trainCentroids(vecs, "vec_id", "embedding", 8)
    val q = vecs.filter($"vec_id" < 6)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val exact = key(SimSearch.bruteForceTopK(q, vecs, "vec_id", "embedding", 3))
    val ivf = key(SimSearch.ivfTopK(q, vecs, "vec_id", "embedding", 3, cents,
      nProbe = 8))
    assert(ivf === exact, "nProbe = nCells must be exhaustive")
  }

  test("nProbe=2 recalls the exact top-1 on clustered data") {
    val cents = SimSearch.trainCentroids(vecs, "vec_id", "embedding", 8)
    val q = vecs.filter($"vec_id" < 8)
    val exact = SimSearch.bruteForceTopK(q, vecs, "vec_id", "embedding", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = SimSearch.ivfTopK(q, vecs, "vec_id", "embedding", 1, cents,
      nProbe = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact.keys.count(qid => ann.get(qid).contains(exact(qid)))
    assert(hits >= 7, s"ivf recall $hits/8: ann=$ann exact=$exact")
    // every vector lands in exactly one cell
    val assign = SimSearch.ivfAssign(vecs, "vec_id", "embedding", cents)
    assert(assign.count() === 64)
    assert(assign.select("cell").distinct().count() > 1)
  }
}
