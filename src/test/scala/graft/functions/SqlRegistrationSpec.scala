package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The codec expressions must be reachable from plain spark.sql — the
  * surface a SQL-facing user of the reference would migrate to.
  */
class SqlRegistrationSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .appName("sql-reg-spec").getOrCreate()
    OracleFunctions.register(s)
    s
  }

  test("registered codec functions evaluate from spark.sql") {
    val r = spark.sql(
      """SELECT
        |  oranumber_to_long(oranumber_from_long(42L)) AS num_rt,
        |  oson_decode(oson_encode('{"a":1,"b":"x"}')) AS oson_rt,
        |  oraxml_blob_decode(encode('<r>ok</r>', 'UTF-8')) AS xml_rt,
        |  cast(gzip_decompress(gzip_compress(encode('zz', 'UTF-8'))) AS STRING) AS gz_rt,
        |  orabinarydouble_decode(orabinarydouble_encode(2.5d)) AS bd_rt,
        |  lob_is_inline(lob_inline(encode('v', 'UTF-8'))) AS inl
        |""".stripMargin).head()
    assert(r.getLong(0) == 42L)
    assert(r.getString(1) == """{"a":1,"b":"x"}""")
    assert(r.getString(2) == "<r>ok</r>")
    assert(r.getString(3) == "zz")
    assert(r.getDouble(4) == 2.5)
    assert(r.getBoolean(5))
  }
}
