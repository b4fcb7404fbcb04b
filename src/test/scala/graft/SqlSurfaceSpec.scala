package graft

/** The SQL-text surface must be VALUE-equivalent to the DataFrame originals
  * it twins — same rows, same order, same schema names — proving the two
  * front doors reach the same engine.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q146 SQL dedup ≡ q11 DataFrame dedup") {
    assert(rows(SparkEntry.q146(spark, dir)) == rows(SparkEntry.q11(spark, dir)))
  }

  test("q147 SQL funnel ≡ q102 DataFrame funnel") {
    assert(rows(SparkEntry.q147(spark, dir)) == rows(SparkEntry.q102(spark, dir)))
  }

  test("q148 SQL drift ≡ q113 DataFrame PSI") {
    assert(rows(SparkEntry.q148(spark, dir)) == rows(SparkEntry.q113(spark, dir)))
  }

  test("q149 SQL sessionize ≡ q83 DataFrame sessionize") {
    assert(rows(SparkEntry.q149(spark, dir)) == rows(SparkEntry.q83(spark, dir)))
  }

  test("q153 SQL ANN ≡ q16 DataFrame top-k") {
    assert(rows(SparkEntry.q153(spark, dir)) == rows(SparkEntry.q16(spark, dir)))
  }

  test("q167 SQL BM25 ≡ q161 DataFrame BM25") {
    assert(rows(SparkEntry.q167(spark, dir)) == rows(SparkEntry.q161(spark, dir)))
  }

  test("q154 SQL star join ≡ q93 DataFrame star join") {
    assert(rows(SparkEntry.q154(spark, dir)) == rows(SparkEntry.q93(spark, dir)))
  }

  // ---- round-12 SQL-surface expansion ----------------------------------

  test("q408 SQL interval join ≡ q05 DataFrame interval stats") {
    assert(rows(SparkEntry.q408(spark, dir)) == rows(SparkEntry.q05(spark, dir)))
  }

  test("q409 SQL as-of join ≡ q63 DataFrame as-of join") {
    assert(rows(SparkEntry.q409(spark, dir)) == rows(SparkEntry.q63(spark, dir)))
  }

  test("q410 SQL weighted median ≡ q101 DataFrame weighted median") {
    assert(rows(SparkEntry.q410(spark, dir)) == rows(SparkEntry.q101(spark, dir)))
  }

  test("q411 SQL profile ≡ q104 DataFrame column profile") {
    assert(rows(SparkEntry.q411(spark, dir)) == rows(SparkEntry.q104(spark, dir)))
  }

  test("q412 SQL retention ≡ q103 DataFrame cohort retention") {
    assert(rows(SparkEntry.q412(spark, dir)) == rows(SparkEntry.q103(spark, dir)))
  }

  test("q413 SQL rollup ≡ q54 DataFrame rollup") {
    assert(rows(SparkEntry.q413(spark, dir)) == rows(SparkEntry.q54(spark, dir)))
  }

  test("q414 SQL top-k ≡ q10 DataFrame top-k") {
    assert(rows(SparkEntry.q414(spark, dir)) == rows(SparkEntry.q10(spark, dir)))
  }

  test("q415 SQL text quality ≡ q13 DataFrame quality score") {
    assert(rows(SparkEntry.q415(spark, dir)) == rows(SparkEntry.q13(spark, dir)))
  }

  test("q416 SQL weekly trend ≡ q07 DataFrame weekly trend") {
    assert(rows(SparkEntry.q416(spark, dir)) == rows(SparkEntry.q07(spark, dir)))
  }

  test("q417 SQL skew report ≡ q112 DataFrame skew report") {
    assert(rows(SparkEntry.q417(spark, dir)) == rows(SparkEntry.q112(spark, dir)))
  }
}
