package graft.tools
import org.apache.spark.sql.SparkSession
/** Regenerates the q_t2k_triples golden rows (committed into
  * SparkEntry.oracleSql as a VALUES table) from the deterministic micro
  * corpus. Run after any semantic change to the pipeline or corpus. */
object DumpGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_t2k_triples")(spark, "unused")
    df.orderBy("subject_uri", "predicate_uri", "object_value").collect().foreach { r =>
      println(s"GOLDEN|${r.getString(0)}|${r.getString(1)}|${r.getString(2)}|${r.getBoolean(3)}|${r.getBoolean(4)}")
    }
    spark.stop()
  }
}
