package graft.onetoone

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Similarity flooding (Melnik et al., ICDE 2002) as used by the reference
 * (SURVEY.md §2.9; /root/reference .../similarityflooding/pipline/
 * SimilarityFloodingPipeline.java:46-119): run per (webTable, kbClass)
 * column-pair matrix, seeded from header or value similarities, fixpoint
 * iterate a propagation formula, drop below minSim, then 1:1-filter.
 *
 * The pairwise-connectivity graph of two flat column lists (each column
 * linked to its table node by the same "column-of" edge label) makes every
 * map-pair (i,j) a neighbour of the table-pair node and, through it, of
 * every other (i',j'). We implement the resulting propagation directly:
 * each pair receives the average of the other pairs' scores, weighted by
 * the propagation coefficient 1/(n-1) of the shared table-pair node.
 *
 * Formulas (reference FixpointFormula): Basic: σ' = σ0 + φ(σ);
 * A: σ' = σ0 + φ(σ0 + σ); B: σ' = φ(σ0 + σ); C: σ' = σ + φ(σ0 + σ).
 * Each iteration normalises by the max. Fixpoint: max per-pair delta
 * < 1e-4 or 1000 iterations.
 *
 * Distribution shape: matrices are tiny — parallelise ACROSS groups
 * (groupByKey.mapGroups), fixpoint inside a task.
 */
object SimilarityFlooding {

  case class Pair(left: Int, right: Int, seed: Double)

  def fixpoint(pairs: Seq[Pair], formula: String = "A", minSim: Double = 0.1,
               maxIter: Int = 1000, eps: Double = 1e-4): Seq[OneToOne.Edge] = {
    if (pairs.isEmpty) return Nil
    val n = pairs.length
    val seed = pairs.map(_.seed).toArray
    var cur = seed.clone()
    val coeff = if (n > 1) 1.0 / (n - 1) else 0.0
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIter && delta > eps) {
      val base = formula match {
        case "Basic" => cur
        case _ => Array.tabulate(n)(i => seed(i) + cur(i)) // A, B, C propagate σ0+σ
      }
      val total = base.sum
      val phi = Array.tabulate(n)(i => coeff * (total - base(i)))
      val next = formula match {
        case "Basic" => Array.tabulate(n)(i => seed(i) + phi(i))
        case "A" => Array.tabulate(n)(i => seed(i) + phi(i))
        case "B" => phi
        case "C" => Array.tabulate(n)(i => cur(i) + phi(i))
        case other => throw new IllegalArgumentException(s"unknown formula: $other")
      }
      val mx = next.max
      if (mx > 0) { var i = 0; while (i < n) { next(i) /= mx; i += 1 } }
      delta = (0 until n).map(i => math.abs(next(i) - cur(i))).max
      cur = next
      it += 1
    }
    pairs.indices.collect {
      case i if cur(i) >= minSim => OneToOne.Edge(pairs(i).left, pairs(i).right, cur(i))
    }
  }

  /** Full SF pass: fixpoint + 1:1 filter, per group, distributed across
    * groups. `corrs`: (groupKey, left, right, score=seed). oneToOne
    * "none" skips the 1:1 filter (bare flooded scores); `maxIter` bounds
    * the fixpoint (1 = the closed-form single propagation step). */
  def run(corrs: DataFrame, formula: String = "A", minSim: Double = 0.1,
          oneToOne: String = "stable", maxIter: Int = 1000): DataFrame = {
    val spark = corrs.sparkSession
    import spark.implicits._
    val kernel: Seq[OneToOne.Edge] => Seq[OneToOne.Edge] = oneToOne match {
      case "none" => identity
      case "greedy" => OneToOne.greedy
      case "stable" => OneToOne.stableMarriage
      case "hungarian" => OneToOne.hungarian
      case other => throw new IllegalArgumentException(s"unknown method: $other")
    }
    corrs.select(col("groupKey").cast("string"), col("left").cast("int"),
        col("right").cast("int"), col("score").cast("double"))
      .as[(String, Int, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val flooded = fixpoint(it.map(t => Pair(t._2, t._3, t._4)).toSeq,
          formula, minSim, maxIter)
        kernel(flooded).map(e => (key, e.left, e.right, e.score))
      }
      .toDF("groupKey", "left", "right", "score")
  }
}
