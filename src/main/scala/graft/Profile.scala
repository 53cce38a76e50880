package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.TextHashExpressions._

/** Ad-hoc stage profiler for the hot dedup path (not part of the driver
  * contract; used to attribute time inside dedup_ngram_jaccard).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    val exploded = docs.select(col("doc_id"),
      explode(distinct_longs(shingleHashes(tokens(col("text")), 2))).as("s"))

    t("explode+count")(exploded.count())
    t("explode noop")(exploded.write.format("noop").mode("overwrite").save())

    val joined = exploded.toDF("ia", "s").join(exploded.toDF("ib", "s"), Seq("s"))
      .filter(col("ia") < col("ib"))
    t("join count")(joined.count())

    val inter = joined
      .select((shiftleft(col("ia"), 32) bitwiseOR col("ib")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("m"))
    t("join+agg noop")(inter.write.format("noop").mode("overwrite").save())

    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    t("join+agg advisory8m")(inter.write.format("noop").mode("overwrite").save())
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")

    val repart = joined
      .select((shiftleft(col("ia"), 32) bitwiseOR col("ib")).as("pair"))
      .repartition(64, col("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("m"))
    t("join+repart64+agg noop")(repart.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
