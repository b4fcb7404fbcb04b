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
}
