package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * Stage checkpointing with per-partition lineage + metrics (SURVEY.md
 * §1.5: the reference's Kryo .bin corpus caches — WebTables.java:280-299,
 * KnowledgeBase.java:320-339 — become columnar checkpoint tables; on a
 * cluster the same layout is Iceberg snapshots, in the sandbox Parquet).
 *
 * A resumed run re-reads a completed stage instead of recomputing it
 * (resumability across the iteration loop). The manifest (JSONL, one line
 * per stage) records stage name, row count, partition count, per-partition
 * row counts and wall time — the "per-partition lineage + metrics" the
 * north rule asks for.
 */
trait Checkpointer {
  def apply(name: String, df: => DataFrame): DataFrame
}

/** No-op: keep the lazy Catalyst DAG. */
object NoopCheckpointer extends Checkpointer {
  def apply(name: String, df: => DataFrame): DataFrame = df
}

/** Persist each stage in memory/disk — stage results are reused across the
  * multiple actions the pipeline and its consumers run, without parquet
  * round-trips. Does NOT truncate lineage. */
object CacheCheckpointer extends Checkpointer {
  def apply(name: String, df: => DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
}

/** Materialise each stage AND truncate its lineage (localCheckpoint).
  * Essential: stage outputs are reused by several downstream joins, and
  * every reuse would otherwise inline the whole upstream logical plan —
  * plan size grows exponentially with pipeline depth without truncation.
  * Right default for local/interactive runs; ParquetCheckpointer gives the
  * same truncation plus durability/resume for cluster runs. */
object LocalCheckpointer extends Checkpointer {
  // eager = false: lineage is truncated at the stage's FIRST action instead
  // of a dedicated blocking job per stage — the round-1 pipeline ran ~8
  // serial barrier jobs before any real work, which capped scaling
  // efficiency (each barrier is a full-cluster sync on mostly-idle tasks).
  def apply(name: String, df: => DataFrame): DataFrame =
    df.localCheckpoint(eager = false)
}

/** LocalCheckpointer + per-stage wall-time on stderr (bench profiling).
  * Each stage's eager materialisation runs under a job group named after
  * the stage, so a listener can attribute task CPU/run time per pipeline
  * stage (ScalingBench's DRAM-wall accounting). */
object TimedLocalCheckpointer extends Checkpointer {
  def apply(name: String, df: => DataFrame): DataFrame = {
    val d = df
    val sc = d.sparkSession.sparkContext
    val t0 = System.nanoTime()
    sc.setJobGroup(name, s"stage $name")
    val out = try d.localCheckpoint() finally sc.clearJobGroup()
    System.err.println(f"[stage] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    out
  }
}

class ParquetCheckpointer(spark: SparkSession, dir: String) extends Checkpointer {
  Files.createDirectories(Paths.get(dir))
  private val manifestPath = Paths.get(dir, "manifest.jsonl")

  private def donePath(name: String) = Paths.get(dir, name, "_GRAFT_DONE")

  def apply(name: String, df: => DataFrame): DataFrame = {
    val path = s"$dir/$name"
    if (Files.exists(donePath(name))) {
      spark.read.parquet(path)          // resume: stage already materialised
    } else {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(path)
      val back = spark.read.parquet(path)
      // per-partition lineage from parquet FOOTERS (metadata only) — the
      // round-1 groupBy(spark_partition_id).count re-scanned every stage's
      // data a second time, doubling checkpoint I/O
      val conf = spark.sessionState.newHadoopConf()
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(conf)
      val perPart = fs.listStatus(hPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
        .map { f =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
          try rd.getRecordCount finally rd.close()
        }
      val wallMs = (System.nanoTime() - t0) / 1000000
      val line = s"""{"stage":"${name}","rows":${perPart.sum},""" +
        s""""partitions":${perPart.length},"perPartitionRows":[${perPart.mkString(",")}],""" +
        s""""wallMs":$wallMs}""" + "\n"
      Files.writeString(manifestPath, line,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      Files.createFile(donePath(name))
      back
    }
  }
}
