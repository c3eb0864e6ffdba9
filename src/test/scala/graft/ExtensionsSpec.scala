package graft

import org.apache.spark.sql.SparkSession

/** The config-driven injection path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must resolve the native
  * functions from SQL with no code registration. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects vec_dot/minhash_sig/simhash64/winnow into a fresh session") {
    val old = spark // ensure the shared session (and its context) exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is static (read at SparkContext launch);
      // in a shared-context test the equivalent path is withExtensions,
      // which drives the same GraftExtensions.apply.
      val injected = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val d = injected.sql(
        "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .collect()(0).getDouble(0)
      assert(d === 11.0)
      val w = injected.sql("SELECT size(winnow('hello world, a winnowed string', 4, 3)) AS n")
        .collect()(0).getInt(0)
      assert(w > 0)
      val sig = injected.sql("SELECT size(minhash_sig(array(CAST(7 AS BIGINT)), 16, 42)) AS n")
        .collect()(0).getInt(0)
      assert(sig === 16)
      // the r4 additions ride the same registration list
      val sic = injected.sql(
        "SELECT sorted_intersect_count(shingle_hashes('a b c d', 2), " +
          "shingle_hashes('a b c e', 2)) AS c")
        .collect()(0).getLong(0)
      assert(sic === 2L) // shared 2-shingles: "a b", "b c"
      // the aggregate rides the same injection list as the expressions
      val mg = injected.sql(
        "SELECT mg_sketch(t) AS mg FROM VALUES ('x'),('x'),('y') AS v(t)")
        .collect()(0).getMap[String, Long](0)
      assert(mg("x") === 2L && mg("y") === 1L)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("mg_sketch is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val m = spark.sql(
      "SELECT mg_sketch(t) AS mg FROM VALUES ('a'),('a'),('b'),('a') AS v(t)")
      .collect()(0).getMap[String, Long](0)
    assert(m("a") === 3L)
    assert(m("b") === 1L)
  }
}
