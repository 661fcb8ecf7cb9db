package graft.tools

import graft.fixtures.ScaleGen
import graft.kb.{CandidateIndex, KbIngest}
import graft.model.SpanCodec
import graft.pipeline.{Candidates, Keys}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measures explicit hot-token salting (T2KConfig.saltHotTokenDf /
 * Salt.skewSplitJoin) on a corpus with a PLANTED Zipfian head token
 * (ScaleGen hotToken): times the full candidate-selection stage with
 * salting off vs on inside one session, and checksums both outputs
 * (orderless xxhash64 sum) to confirm the salted plan is output-identical.
 *
 * Usage: runMain graft.tools.SaltProbe [nTables] [rowsPerTable] [nEntities] [hotEvery] [saltDf]
 */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val nTables = args.lift(0).map(_.toInt).getOrElse(2000)
    val rowsPerTable = args.lift(1).map(_.toInt).getOrElse(100)
    val nEntities = args.lift(2).map(_.toInt).getOrElse(50000)
    val hotEvery = args.lift(3).map(_.toInt).getOrElse(50)
    val saltDf = args.lift(4).map(_.toLong).getOrElse(500L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = ScaleGen.Config(nTables = nTables, rowsPerTable = rowsPerTable,
      nEntities = nEntities, hotToken = hotEvery)
    val (docs0, _, _, _) = ScaleGen.webCorpus(spark, cfg)
    val docs = docs0.localCheckpoint(true)
    val kb = KbIngest.fromLongForm(spark,
      ScaleGen.kbLongForm(spark, cfg).localCheckpoint(true),
      ScaleGen.hierarchy(cfg))
    val sf = ScaleGen.surfaceForms(spark, cfg).localCheckpoint(true)
    val cells = SpanCodec.cells(docs).localCheckpoint(true)
    val keyCols = Keys.detect(SpanCodec.columns(docs)).localCheckpoint(true)
    val index = CandidateIndex.build(kb.cells, sf).localCheckpoint(true)
    val hotDf = index.filter(col("token") === "hotshared")
      .select("nameId").distinct().count()
    println(s"SALTPROBE|hot token index df (names)=$hotDf")

    def run(label: String, salt: Long): Unit = for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val out = Candidates.generate(cells, keyCols, index, 50, 0.2,
        rankByIdf = true, saltHotTokenDf = salt)
      val r = out.agg(count(lit(1)).as("n"),
        sum(xxhash64(col("tableName"), col("rowNum"), col("uri"),
          col("classId"), round(col("score"), 9))).as("chk")).head()
      println(f"SALTPROBE|$label|rep$rep|${(System.nanoTime() - t0) / 1e9}%.2f s|" +
        f"rows=${r.getLong(0)}|checksum=${r.getLong(1)}")
    }
    run("plain salt=0", 0L)
    run(s"salted df>=$saltDf", saltDf)
    spark.stop()
  }
}
