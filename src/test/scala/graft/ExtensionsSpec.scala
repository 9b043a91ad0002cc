package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-facing registration of the custom expressions (reference analog: the
  * provider switch registering sources/targets, cmd/run.go:66-89). Uses its
  * own session because extensions bind at session build time. */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate() reuses any existing session, so conf-time extensions can't
  // be asserted inside the shared-suite JVM; use an isolated child session
  // with runtime registration (the conf path is exercised by tools/Sql).
  private lazy val spark: SparkSession = {
    val s = TestSpark.spark.newSession()
    GraftExtensions.register(s)
    s
  }

  test("grok_extract is callable from SQL and parses the standard pattern") {
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      s"""SELECT grok_extract('[INFO] tool=bash dur=42ms status=ok hello world',
         '${graft.parse.GrokParser.Pattern.replace("\\", "\\\\")}') AS g""")
      .selectExpr("g.level", "g.tool", "g.dur_ms", "g.status", "g.payload")
      .collect()(0)
    assert(row.getString(0) === "INFO")
    assert(row.getString(1) === "bash")
    assert(row.getInt(2) === 42)
    assert(row.getString(3) === "ok")
    assert(row.getString(4) === "hello world")
  }

  test("simhash64 / minhash_signature / word_shingles from SQL") {
    val r = spark.sql(
      """SELECT simhash64(array('a','b')) AS sh,
         minhash_signature(array('a b c'), 4) AS mh,
         word_shingles('A  b c', 2) AS ws""").collect()(0)
    assert(r.getLong(0) !== 0L)
    assert(r.getSeq[Long](1).length === 4)
    assert(r.getSeq[String](2).toSeq === Seq("a b", "b c"))
    // SQL results equal the Column-API kernels
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaCol = Seq("A  b c").toDF("t")
      .select(graft.functions.WordShinglesFunctions.word_shingles(col("t"), 2))
      .collect()(0).getSeq[String](0)
    assert(viaCol.toSeq === r.getSeq[String](2).toSeq)
  }

  test("nfc_normalize from SQL composes combining marks") {
    val r = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS n, nfc_normalize('ascii') AS a")
      .collect()(0)
    assert(r.getString(0) === "caf\u00e9")
    assert(r.getString(1) === "ascii")
  }
}
