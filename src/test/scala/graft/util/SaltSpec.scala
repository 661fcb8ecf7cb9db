package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed keys") {
    // Zipf-ish fact: one key holds half the rows
    val fact = (0 until 10000).map(i =>
      (if (i % 2 == 0) "hot" else s"k${i % 50}", i.toLong))
      .toDF("classKey", "v")
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"meta$i") }
      .toDF("classKey", "meta")
    val plain = fact.join(dim, "classKey")
      .select("classKey", "v", "meta").as[(String, Long, String)].collect().toSet
    val salted = Salt.saltedJoin(fact, dim, "classKey", 8, Seq("v"))
      .select("classKey", "v", "meta").as[(String, Long, String)].collect().toSet
    assert(salted === plain)
  }

  test("salting spreads a hot key across partitions") {
    val fact = (0 until 4096).map(i => ("hot", i.toLong)).toDF("classKey", "v")
    val parted = Salt.saltedRepartition(fact, "classKey", 8, Seq("v"), 8)
    val perPart = parted.groupBy(spark_partition_id()).count()
      .select("count").as[Long].collect()
    // without salting all 4096 rows land in ONE partition
    assert(perPart.length > 1, s"still one partition: ${perPart.toSeq}")
    assert(perPart.max < 4096)
  }

  test("hot-key detection") {
    val fact = ((0 until 1000).map(_ => "hot") ++ Seq("cold1", "cold2"))
      .toDF("classKey")
    val hot = Salt.hotKeys(fact, "classKey", 100).as[(String, Long)].collect()
    assert(hot.toSeq === Seq(("hot", 1000L)))
  }

  test("skew-split join equals plain join (hot and cold legs partition output)") {
    val left = (0 until 5000).map(i =>
      (if (i % 2 == 0) "hot" else s"t${i % 40}", i.toLong)).toDF("token", "uri")
    val right = (0 until 200).map(i =>
      (if (i % 4 == 0) "hot" else s"t${i % 40}", i)).toDF("token", "rowNum")
    val plain = left.join(right, "token")
      .select("token", "uri", "rowNum").as[(String, Long, Int)].collect().toSet
    val split = Salt.skewSplitJoin(left, right, "token", 8, 1000, Seq("uri"))
      .select("token", "uri", "rowNum").as[(String, Long, Int)].collect().toSet
    assert(split === plain)
  }

  test("salted candidate token join (pipeline path) matches unsalted output") {
    // skewed fixture: every entity name shares the stop-ish token "club";
    // rare tokens identify the entity. saltHotTokenDf=50 salts "club".
    val names = (0 until 300).map(i => (s"u$i", 0, i.toLong, 2, s"club n$i"))
    val index = names.toDF("uri", "classId", "nameId", "nNameTok", "name")
      .select(col("uri"), col("classId"), col("nameId"), col("nNameTok"),
        explode(split(col("name"), " ")).as("token"))
    val cells = (0 until 40).map(i =>
      ("t1", i, 0, "text", s"club n$i", null: String))
      .toDF("tableName", "rowNum", "colIdx", "kind", "text", "mediaRef")
    val keyCols = Seq(("t1", 0)).toDF("tableName", "colIdx")
    def run(salt: Long) = graft.pipeline.Candidates
      .generate(cells, keyCols, index, 5, 0.2, saltHotTokenDf = salt)
      .select("tableName", "rowNum", "uri", "score")
      .as[(String, Int, String, Double)].collect().toSet
    val unsalted = run(0)
    val salted = run(50)
    assert(unsalted.nonEmpty)
    assert(salted === unsalted)
  }
}
