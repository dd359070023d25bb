package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: functions injected via spark.sql.extensions are
  * callable from plain SQL in a session built with the conf — the
  * cluster-deployment registration path.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injected at session build exposes the custom functions in SQL") {
    val base = TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the same hook `spark.sql.extensions=graft.
      // GraftExtensions` reaches through Spark's conf loader — the conf
      // form is a STATIC setting and cannot bind to the already-running
      // shared test context
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val shingles = s.sql("SELECT char_shingle_hashes('abcdefgh', 5) AS h")
        .collect().head.getSeq[Long](0)
      assert(shingles.length == 4) // 8 bytes, k=5 → 4 windows
      val dp = s.sql(
        "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
        .collect().head.getDouble(0)
      assert(dp == 32.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
