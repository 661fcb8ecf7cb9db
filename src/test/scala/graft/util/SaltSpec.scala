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
}
