package graft.onetoone

import graft.SparkSpec
import OneToOne.Edge

class OneToOneSpec extends SparkSpec {

  val edges = Seq(
    Edge(0, 0, 0.9), Edge(0, 1, 0.8),
    Edge(1, 0, 0.7), Edge(1, 1, 0.2),
    Edge(2, 1, 0.6), Edge(2, 2, 0.5))

  test("greedy 1:1 takes best non-conflicting edges") {
    // sorted desc: (0,0,.9) kept; (0,1) left used; (1,0) right used;
    // (2,1,.6) kept; (2,2) left used; (1,1) right 1 used -> dropped
    assert(OneToOne.greedy(edges).map(e => (e.left, e.right)) ===
      Seq((0, 0), (2, 1)))
  }

  test("stable marriage is stable") {
    val m = OneToOne.stableMarriage(edges)
    val score = edges.map(e => (e.left, e.right) -> e.score).toMap
    val byL = m.map(e => e.left -> e.right).toMap
    val byR = m.map(e => e.right -> e.left).toMap
    // no blocking pair: an (l, r) both prefer over their match
    for (e <- edges) {
      val lPrefers = byL.get(e.left).forall(cur => score((e.left, cur)) < e.score)
      val rPrefers = byR.get(e.right).forall(cur => score((cur, e.right)) < e.score)
      assert(!(lPrefers && rPrefers), s"blocking pair $e")
    }
  }

  test("hungarian maximises total score") {
    val h = OneToOne.hungarian(edges)
    val total = h.map(_.score).sum
    // optimal: (0,1)=0.8 + (1,0)=0.7 + (2,2)=0.5 = 2.0 beats greedy 1.7
    assert(math.abs(total - 2.0) < 1e-9, s"got $h")
  }

  test("distributed harness matches local kernel per group") {
    import spark.implicits._
    val df = edges.map(e => ("g1", e.left, e.right, e.score))
      .toDF("groupKey", "left", "right", "score")
    val out = OneToOne.filterPerGroup(df, "hungarian")
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(out === OneToOne.hungarian(edges).map(e => (e.left, e.right)).toSet)
  }

  test("similarity flooding converges and keeps strong pairs") {
    val pairs = Seq(
      SimilarityFlooding.Pair(0, 0, 1.0), SimilarityFlooding.Pair(0, 1, 0.1),
      SimilarityFlooding.Pair(1, 1, 0.8), SimilarityFlooding.Pair(1, 0, 0.05))
    // Basic and A retain the seed each round — ordering must survive.
    for (formula <- Seq("Basic", "A")) {
      val out = SimilarityFlooding.fixpoint(pairs, formula, minSim = 0.05)
      assert(out.nonEmpty, s"formula $formula dropped everything")
      val best = out.maxBy(_.score)
      assert(best.left === 0 && best.right === 0, s"formula $formula best=$best")
    }
    // B and C accumulate pure propagation; on flat column matrices they
    // converge toward the table-pair average (degenerate by design) — the
    // reference's driver sweep defaults to A. Only require survival.
    for (formula <- Seq("B", "C"))
      assert(SimilarityFlooding.fixpoint(pairs, formula, minSim = 0.05).nonEmpty)
  }

  test("SF + 1:1 end-to-end per group") {
    import spark.implicits._
    val df = Seq(("t1", 0, 0, 1.0), ("t1", 0, 1, 0.2), ("t1", 1, 1, 0.9),
      ("t1", 1, 0, 0.1), ("t2", 0, 0, 0.7))
      .toDF("groupKey", "left", "right", "score")
    val out = SimilarityFlooding.run(df, "A", 0.05, "stable")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(out.contains(("t1", 0, 0)) && out.contains(("t1", 1, 1)))
    assert(out.contains(("t2", 0, 0)))
  }
}
