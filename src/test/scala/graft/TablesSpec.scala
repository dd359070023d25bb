package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the driver-testdata table adapters: a silent
  * testdata schema change (like r6's events `ts` NANOS→MICROS flip,
  * which killed 12 gated queries at once) must surface here as a named
  * one-line failure, not as a dozen dead queries downstream.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("every Tables.All table loads at sf0.001 with rows") {
    Tables.All.foreach { name =>
      val df = Tables.table(spark, TestSpark.Sf, name)
      assert(df.limit(1).count() == 1L, s"table $name is empty or unreadable")
    }
  }

  test("events adapter exposes ts TimestampType AND ts_ns LongType") {
    val ev = Tables.events(spark, TestSpark.Sf)
    val types = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("ts") == TimestampType, s"ts is ${types("ts")}")
    assert(types("ts_ns") == LongType, s"ts_ns is ${types("ts_ns")}")
    // ts and ts_ns must describe the same instant (ns = us * 1000).
    import org.apache.spark.sql.functions._
    val bad = ev.where(unix_micros(col("ts")) * lit(1000L) =!= col("ts_ns")).count()
    assert(bad == 0L, s"$bad rows where ts_ns != unix_micros(ts)*1000")
    // ts actually evaluates (the r6 break was an unresolvable expression).
    assert(ev.select(max(col("ts"))).head().get(0) != null)
  }

  test("key columns keep their expected Spark-side types") {
    def dt(t: String, c: String): DataType =
      Tables.table(spark, TestSpark.Sf, t).schema(c).dataType
    assert(dt("lineitem", "l_quantity") == DoubleType)
    // Parquet stores these with isAdjustedToUTC=false → NTZ in Spark.
    assert(Set[DataType](TimestampType, TimestampNTZType)
      .contains(dt("lineitem", "l_shipdate")))
    assert(Set[DataType](TimestampType, TimestampNTZType)
      .contains(dt("orders", "o_orderdate")))
    assert(dt("documents", "text") == StringType)
    assert(dt("embeddings", "embedding") == ArrayType(FloatType, containsNull = true))
    assert(dt("events", "props") == StringType)
  }
}
