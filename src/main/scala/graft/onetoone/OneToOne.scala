package graft.onetoone

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * One-to-one matching post-processors (SURVEY.md §2.8; reference
 * /root/reference .../t2k/match/T2KMatch.java:686-777):
 *  - M1 greedy top-one (745-777): repeatedly take the best-scored edge,
 *    evict conflicting rows/columns;
 *  - M2 stable marriage (704-731): Gale–Shapley on the score matrix;
 *  - M3 Hungarian (686-702): optimal assignment, O(n³) on tiny matrices.
 *
 * Distribution shape: the matrices are per (webTable, kbClass) and tiny
 * (cols × props), so the graph is NEVER distributed — thousands of
 * independent matrices parallelise across groups via groupByKey.mapGroups
 * and each kernel runs as plain Scala inside one task (SURVEY.md §2.9
 * "distributing the graph is wrong").
 */
object OneToOne {

  /** One scored edge within a matrix group. */
  case class Edge(left: Int, right: Int, score: Double)

  /** M1: greedy 1:1 — highest score first, ties (left, right) asc. */
  def greedy(edges: Seq[Edge]): Seq[Edge] = {
    val sorted = edges.sortBy(e => (-e.score, e.left, e.right))
    val usedL = collection.mutable.Set[Int]()
    val usedR = collection.mutable.Set[Int]()
    sorted.flatMap { e =>
      if (!usedL(e.left) && !usedR(e.right)) {
        usedL += e.left; usedR += e.right; Some(e)
      } else None
    }
  }

  /** M2: stable marriage (left proposes), preference by score desc. */
  def stableMarriage(edges: Seq[Edge]): Seq[Edge] = {
    val score = edges.map(e => (e.left, e.right) -> e.score).toMap
    val prefs = edges.groupBy(_.left).map { case (l, es) =>
      l -> es.sortBy(e => (-e.score, e.right)).map(_.right).toIndexedSeq
    }
    val nextIdx = collection.mutable.Map[Int, Int]().withDefaultValue(0)
    val engagedTo = collection.mutable.Map[Int, Int]() // right -> left
    val free = collection.mutable.Queue[Int](prefs.keys.toSeq.sorted: _*)
    while (free.nonEmpty) {
      val l = free.dequeue()
      val pl = prefs(l)
      var done = false
      while (!done && nextIdx(l) < pl.length) {
        val r = pl(nextIdx(l)); nextIdx(l) += 1
        engagedTo.get(r) match {
          case None => engagedTo(r) = l; done = true
          case Some(cur) =>
            val sNew = score((l, r)); val sCur = score((cur, r))
            if (sNew > sCur || (sNew == sCur && l < cur)) {
              engagedTo(r) = l; free.enqueue(cur); done = true
            }
        }
      }
    }
    engagedTo.toSeq.sortBy(_._1).map { case (r, l) => Edge(l, r, score((l, r))) }
  }

  /** M3: Hungarian algorithm (maximum-score assignment) on the dense
    * matrix implied by the edges (missing pairs = 0). */
  def hungarian(edges: Seq[Edge]): Seq[Edge] = {
    if (edges.isEmpty) return Nil
    val ls = edges.map(_.left).distinct.sorted
    val rs = edges.map(_.right).distinct.sorted
    val n = math.max(ls.length, rs.length)
    val score = edges.map(e => (e.left, e.right) -> e.score).toMap
    val maxS = edges.map(_.score).max
    // cost matrix (minimisation): cost = maxS - score, padded square
    val cost = Array.tabulate(n, n) { (i, j) =>
      if (i < ls.length && j < rs.length)
        maxS - score.getOrElse((ls(i), rs(j)), 0.0)
      else maxS
    }
    val assignment = solveHungarian(cost)
    assignment.toSeq.collect {
      case (i, j) if i < ls.length && j < rs.length &&
        score.contains((ls(i), rs(j))) =>
        Edge(ls(i), rs(j), score((ls(i), rs(j))))
    }.sortBy(_.left)
  }

  /** O(n³) Hungarian (Jonker-style potentials), returns row->col map. */
  private def solveHungarian(cost: Array[Array[Double]]): Map[Int, Int] = {
    val n = cost.length
    val u = new Array[Double](n + 1)
    val v = new Array[Double](n + 1)
    val p = Array.fill(n + 1)(0) // p(j) = row matched to column j (1-based)
    val way = Array.fill(n + 1)(0)
    for (i <- 1 to n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(n + 1)(Double.MaxValue)
      val used = Array.fill(n + 1)(false)
      var done = false
      while (!done) {
        used(j0) = true
        val i0 = p(j0)
        var delta = Double.MaxValue
        var j1 = -1
        for (j <- 1 to n if !used(j)) {
          val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
          if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
          if (minv(j) < delta) { delta = minv(j); j1 = j }
        }
        for (j <- 0 to n) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
        }
        j0 = j1
        if (p(j0) == 0) done = true
      }
      var j = j0
      while (j != 0) { p(j) = p(way(j)); j = way(j) }
    }
    (1 to n).map(j => (p(j) - 1) -> (j - 1)).toMap
  }

  /**
   * Distributed harness: 1:1-filter scored correspondences per group.
   * `corrs` columns: (groupKey: String, left: Int, right: Int,
   * score: Double). Thousands of groups run in parallel; each kernel is
   * in-task Scala on a tiny matrix.
   */
  def filterPerGroup(corrs: DataFrame, method: String): DataFrame = {
    val spark = corrs.sparkSession
    import spark.implicits._
    val kernel: Seq[Edge] => Seq[Edge] = method match {
      case "greedy" => greedy
      case "stable" => stableMarriage
      case "hungarian" => hungarian
      case other => throw new IllegalArgumentException(s"unknown method: $other")
    }
    corrs.select(col("groupKey").cast("string"), col("left").cast("int"),
        col("right").cast("int"), col("score").cast("double"))
      .as[(String, Int, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        kernel(it.map(t => Edge(t._2, t._3, t._4)).toSeq)
          .map(e => (key, e.left, e.right, e.score))
      }
      .toDF("groupKey", "left", "right", "score")
  }
}
