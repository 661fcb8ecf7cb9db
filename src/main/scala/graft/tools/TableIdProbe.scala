package graft.tools

import graft.fixtures.ScaleGen
import graft.kb.{CandidateIndex, KbIngest}
import graft.model.SpanCodec
import graft.pipeline.{Candidates, Keys}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Shuffle-byte + wall measurement of the candidate SELECTION stage alone
 * (the engine's biggest shuffle), parameterised by table-name length
 * (ScaleGen.tableNamePad) — quantifies what dictionary-encoding
 * tableName -> tableId buys at realistic name lengths. Run against both
 * the before (string keys) and after (tableId keys) class snapshots.
 *
 * Usage: runMain graft.tools.TableIdProbe [nTables] [rowsPerTable] [nEntities] [namePad]
 */
object TableIdProbe {
  def main(args: Array[String]): Unit = {
    val nTables = args.lift(0).map(_.toInt).getOrElse(5000)
    val rowsPerTable = args.lift(1).map(_.toInt).getOrElse(100)
    val nEntities = args.lift(2).map(_.toInt).getOrElse(50000)
    val namePad = args.lift(3).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufW = new java.util.concurrent.atomic.AtomicLong(0)
    val shufR = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    def drain(): Unit = { // two quiet 300ms intervals, bounded
      var prev = -1L; var quiet = 0; var tries = 0
      while (tries < 40 && quiet < 2) {
        if (shufW.get + shufR.get == prev) quiet += 1 else quiet = 0
        prev = shufW.get + shufR.get; Thread.sleep(300); tries += 1
      }
    }

    val cfg = ScaleGen.Config(nTables = nTables, rowsPerTable = rowsPerTable,
      nEntities = nEntities, tableNamePad = namePad)
    val (docs0, _, _, _) = ScaleGen.webCorpus(spark, cfg)
    val docs = docs0.localCheckpoint(true)
    val kb = KbIngest.fromLongForm(spark,
      ScaleGen.kbLongForm(spark, cfg).localCheckpoint(true),
      ScaleGen.hierarchy(cfg))
    val sf = ScaleGen.surfaceForms(spark, cfg).localCheckpoint(true)
    val cells = SpanCodec.cells(docs).localCheckpoint(true)
    val keyCols = Keys.detect(SpanCodec.columns(docs)).localCheckpoint(true)
    val index = CandidateIndex.build(kb.cells, sf).localCheckpoint(true)

    for (rep <- 1 to 3) {
      drain()
      val (w0, r0) = (shufW.get, shufR.get)
      val t0 = System.nanoTime()
      val n = Candidates.generate(cells, keyCols, index, 50, 0.2,
        rankByIdf = true).count()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"TIDPROBE|pad=$namePad|rep$rep|$wall%.2f s|rows=$n|" +
        f"shufW=${(shufW.get - w0) / 1048576.0}%.1f MB|shufR=${(shufR.get - r0) / 1048576.0}%.1f MB")
    }
    spark.stop()
  }
}
