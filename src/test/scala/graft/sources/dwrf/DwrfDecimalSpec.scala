package graft.sources.dwrf

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Short decimals (precision <= 18) ride the long kernels as unscaled
  * values — beyond the reference, which predates ORC's DECIMAL kind.
  * Covers: both vector storages (int for p<=9, long above), the row
  * path, nulls, negatives, dictionary-eligible low-cardinality data,
  * and the p>18 fail-loud boundary.
  */
class DwrfDecimalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mkdir(): String = Files.createTempDirectory(
    java.nio.file.Paths.get("/root/repo/target"), "dwrf-dec-").toString

  test("decimal columns round-trip exactly through both read paths") {
    val s = spark
    import s.implicits._
    val dir = mkdir()
    val df = spark.range(0, 5000, 1, 3).select(
      col("id"),
      // p<=9: int-vector storage; negatives cross zero
      ((col("id") - 2500) / 100.0).cast("decimal(9,2)").as("d9"),
      // p in (9,18]: long-vector storage; wide values
      ((col("id") * 1234567) / 1000.0).cast("decimal(18,3)").as("d18"),
      // low cardinality: exercises the integer dictionary encoder
      (col("id") % 7).cast("decimal(5,1)").as("dict"),
      // nulls interleaved
      when(col("id") % 3 =!= 0, col("id").cast("decimal(10,0)")).as("dn"))
    df.write.format("dwrf").mode("overwrite").save(dir)

    val back = spark.read.format("dwrf").load(dir)
    assert(back.schema("d9").dataType.sql == "DECIMAL(9,2)")
    assert(back.schema("d18").dataType.sql == "DECIMAL(18,3)")
    // columnar (default) path
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // aggregates stay decimal-exact
    val sums = back.agg(
      sum($"d9").as("s9"), sum($"d18").as("s18"), count($"dn").as("cn"))
      .head()
    val expect = df.agg(sum($"d9"), sum($"d18"), count($"dn")).head()
    assert(sums == expect)
  }

  test("p > 18 fails loud instead of writing garbage") {
    val s = spark
    import s.implicits._
    val dir = mkdir()
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => String.valueOf(e.getMessage)).mkString(" | ")
    val e = intercept[Exception](
      spark.range(10).select(col("id").cast("decimal(25,2)").as("big"))
        .write.format("dwrf").mode("overwrite").save(dir))
    assert(chain(e).contains("unsupported type"), chain(e))
  }
}
