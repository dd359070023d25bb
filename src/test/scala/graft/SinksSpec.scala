package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val region = Tables.table(spark, TestSpark.Sf, "region")

  test("columnar + line sinks round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("sinks").toString
    Sinks.writeColumnar(region, s"$dir/p", "parquet")
    Sinks.writeColumnar(region, s"$dir/o", "orc")
    Sinks.writeLines(region, s"$dir/c", "csv")
    Sinks.writeLines(region, s"$dir/j", "json")
    val want = region.collect().map(_.toSeq).toSet
    assert(spark.read.parquet(s"$dir/p").collect().map(_.toSeq).toSet == want)
    assert(spark.read.orc(s"$dir/o").collect().map(_.toSeq).toSet == want)
    assert(spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/c").collect().map(_.toSeq).toSet == want)
    assert(spark.read.json(s"$dir/j").select($"r_regionkey", $"r_name")
      .collect().map(_.toSeq).toSet == want)
  }

  test("writeBranches: side output splits one pass into n sinks") {
    val dir = java.nio.file.Files.createTempDirectory("branches").toString
    Sinks.writeBranches(region, Seq(
      ((df: org.apache.spark.sql.DataFrame) => df.filter($"r_regionkey" < 2), s"$dir/low"),
      ((df: org.apache.spark.sql.DataFrame) => df.filter($"r_regionkey" >= 2), s"$dir/high")))
    val low = spark.read.parquet(s"$dir/low").count()
    val high = spark.read.parquet(s"$dir/high").count()
    assert(low + high == region.count())
    assert(low > 0 && high > 0)
  }
}
