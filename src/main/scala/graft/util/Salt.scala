package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Explicit skew handling for Zipfian KB classes / hot tokens (SURVEY.md
 * §4 "absent: skew handling"; north rule: "explicit salting/repartition
 * for skewed KB classes").
 *
 * saltedJoin(fact, dim, key, S): the fact side gets a deterministic salt
 * in [0, S) derived from its row content; the dim side is replicated S
 * ways; the join key becomes (key, salt) so one hot key spreads across S
 * partitions instead of one straggler task. AQE's skew-join splitting
 * handles moderate skew automatically — explicit salting is for the
 * pathological head keys (a KB class holding half the entities) where
 * even a split partition exceeds executor memory.
 */
object Salt {

  /** Inner equi-join on `key` with S-way salting of the hot side.
    * `factSaltCols` seed the salt (any stable row columns). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, s: Int,
                 factSaltCols: Seq[String]): DataFrame = {
    require(s > 0)
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(factSaltCols.map(col): _*), lit(s)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until s).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Repartition a fact table by (key, salt) so downstream per-key work
    * spreads hot keys across `s` partitions per key. */
  def saltedRepartition(df: DataFrame, key: String, s: Int,
                        saltCols: Seq[String], numPartitions: Int): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(saltCols.map(col): _*), lit(s)).cast("int"))
      .repartition(numPartitions, col(key), col("_salt"))
      .drop("_salt")

  /** Top-k hot keys by frequency — decide what to salt from data, not
    * guesswork (driver-sized result). */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).filter(col("n") >= minCount)

  /** Split-salted inner equi-join for large × large joins on Zipfian keys
    * (the candidate token join on a pathologically hot class/token): keys
    * whose LEFT-side frequency reaches `minCount` take the salted leg
    * (left rows content-salted s ways, right hot rows replicated s ways);
    * everything else joins normally. A key is hot or cold as a whole, so
    * the two legs partition the output exactly. Use where even an
    * AQE-split partition would exceed executor memory. */
  def skewSplitJoin(left: DataFrame, right: DataFrame, key: String, s: Int,
                    minCount: Long, leftSaltCols: Seq[String]): DataFrame = {
    val hot = hotKeys(left, key, minCount).select(key)
    val lHot = left.join(broadcast(hot), Seq(key), "left_semi")
    val lCold = left.join(broadcast(hot), Seq(key), "left_anti")
    val rHot = right.join(broadcast(hot), Seq(key), "left_semi")
    val rCold = right.join(broadcast(hot), Seq(key), "left_anti")
    lCold.join(rCold, key)
      .unionByName(saltedJoin(lHot, rHot, key, s, leftSaltCols))
  }
}
