package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed exclusive scan must agree with the single-partition
  * window formulation (the semantics) while never BEING one (the scale
  * property), and its output must be invariant to how the input arrives.
  */
class PrefixSumSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", false)
    .appName("prefix-sum-spec").getOrCreate()

  private def reference(rows: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (k, v) =>
      val r = (k, v, acc); acc += v; r
    }
  }

  test("exclusive scan equals the window formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val rows = new scala.util.Random(7L)
      .shuffle((0L until 500L).toList)
      .map(k => (k, rnd.nextInt(2000).toLong))
    val df = rows.toDF("k", "v")
    val got = PrefixSum.withRunningTotal(df, "k", "v", "cum")
      .select("k", "v", "cum").orderBy("k")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === reference(rows))
  }

  test("output is invariant under adversarial input partitioning") {
    import spark.implicits._
    val rows = (0L until 300L).map(k => (k, (k * 13 % 97) + 1))
    val layouts = Seq(
      rows.toDF("k", "v").repartition(1),
      rows.toDF("k", "v").repartition(17, col("v")), // keyed by VALUE
      rows.reverse.toDF("k", "v").repartition(5))
    val results = layouts.map { df =>
      PrefixSum.withRunningTotal(df, "k", "v", "cum")
        .select("k", "cum").orderBy("k")
        .as[(Long, Long)].collect().toSeq
    }
    assert(results.distinct.size === 1,
      "prefix sum must not depend on input partitioning")
    assert(results.head === reference(rows).map(t => (t._1, t._3)))
  }

  test("the gate plan contains no single-partition global window") {
    val p = graft.SparkEntry.queries("text_pack")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window ["),
      s"packing must use the distributed scan, not a global window:\n$p")
  }

  test("empty input and single-row input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.withRunningTotal(empty, "k", "v", "cum").count() === 0L)
    val one = Seq((42L, 7L)).toDF("k", "v")
    val got = PrefixSum.withRunningTotal(one, "k", "v", "cum")
      .select("k", "v", "cum").as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((42L, 7L, 0L)))
  }
}
