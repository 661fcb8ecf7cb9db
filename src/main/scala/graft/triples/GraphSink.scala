package graft.triples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Partitioned graph materialisation (SURVEY.md §2.1 S7): triples land in
 * a columnar table partitioned by predicate id and bucketed by subject
 * hash, so downstream per-predicate scans prune partitions and
 * subject-key joins co-locate. On a cluster the same layout is an Iceberg
 * table (`bucket(subj) x predId` partition spec); in the sandbox it is a
 * two-level parquet directory tree.
 */
object GraphSink {

  /** Write triples partitioned by (pred_part, subj_bucket). */
  def write(triples: DataFrame, path: String, subjectBuckets: Int = 16): Unit =
    triples
      .withColumn("pred_part",
        regexp_replace(col("predicateUri"), "[^a-zA-Z0-9]+", "_"))
      .withColumn("subj_bucket",
        pmod(xxhash64(col("subjectUri")), lit(subjectBuckets)).cast("int"))
      .repartition(col("pred_part"), col("subj_bucket"))
      .write.mode("overwrite")
      .partitionBy("pred_part", "subj_bucket")
      .parquet(path)

  /** Read back with partition pruning on predicate. */
  def readPredicate(spark: org.apache.spark.sql.SparkSession, path: String,
                    predicateUri: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("pred_part") ===
        predicateUri.replaceAll("[^a-zA-Z0-9]+", "_"))
}
