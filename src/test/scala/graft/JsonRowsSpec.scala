package graft

import graft.functions.JsonRows
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Serialization parity (F1-F3, `service_layer/service.py:177-182`):
  * null retention, ISO microsecond timestamps, lossy Decimal→float. */
class JsonRowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("null fields are KEPT (json.dumps parity; Spark default would drop them)") {
    val df = Seq((1L, Option.empty[String])).toDF("id", "s")
    val j = df.select(JsonRows.toJsonCol(df)).collect()(0).getString(0)
    assert(j == """{"id":1,"s":null}""")
  }

  test("timestamps serialize as ISO-8601 with microseconds (isoformat parity)") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")))
      .toDF("id", "ts")
    val j = df.select(JsonRows.toJsonCol(df)).collect()(0).getString(0)
    assert(j == """{"id":1,"ts":"2024-01-02T03:04:05.123456"}""")
  }

  test("DecimalType serializes lossily as double (json_serialize Decimal→float parity)") {
    val df = Seq(1L).toDF("id")
      .withColumn("d", lit("123.45").cast(DecimalType(10, 2)))
    val j = df.select(JsonRows.toJsonCol(df)).collect()(0).getString(0)
    // double rendering, not the decimal's exact string form
    assert(j == """{"id":1,"d":123.45}""")
  }

  test("key order = column order (dict insertion-order parity)") {
    val df = Seq((2.5, "x", 7L)).toDF("b_val", "a_str", "c_num")
    val j = df.select(JsonRows.toJsonCol(df)).collect()(0).getString(0)
    assert(j.indexOf("b_val") < j.indexOf("a_str"))
    assert(j.indexOf("a_str") < j.indexOf("c_num"))
  }
}
