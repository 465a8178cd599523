package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.dwrf.TestSpark

class KmvSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def approx(df: org.apache.spark.sql.DataFrame, col: String, k: Int): Long = {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("kmv_in")
    spark.sql(s"SELECT CAST(kmv_distinct($col, $k) AS BIGINT) FROM kmv_in")
      .collect().head.getLong(0)
  }

  test("exact below k, within ~5% above k") {
    val df = spark.range(0, 100000, 1, 8)
      .select((col("id") % 500).as("low"), (col("id") % 20000).as("high"))
    assert(approx(df, "low", 1024) == 500, "cardinality < k must be exact")
    val est = approx(df, "high", 1024)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05,
      s"got $est for true 20000 at k=1024")
  }

  test("estimate is independent of partitioning and merge order") {
    val base = spark.range(0, 50000, 1, 1).select((col("id") % 7777).as("v"))
    val a = approx(base, "v", 256)
    val b = approx(base.repartition(32), "v", 256)
    val c = approx(base.repartition(3, col("v")), "v", 256)
    assert(a == b && b == c, s"KMV union must be order-independent: $a $b $c")
  }

  test("strings and longs both hash; nulls ignored") {
    // 300 is divisible by 10, so residues ≡ 0 (mod 10) are ALWAYS null:
    // 270 distinct non-null strings
    val df = spark.range(0, 10000, 1, 4).select(
      when(col("id") % 10 =!= 0, concat(lit("s"), col("id") % 300)).as("s"))
    assert(approx(df, "s", 1024) == 270, "270 distinct strings, nulls skipped")
  }
}
