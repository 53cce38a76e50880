package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.VectorFunctions._

/** Ad-hoc stage profiler (not part of the driver contract). Currently
  * instrumented for ann_bruteforce_topk stage attribution.
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

    spark.read.parquet(s"$dir/embeddings.parquet").count()

    val e = embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("n2", normQ2(col("q")))
    t("e count")(e.count())
    val qs = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn2"))
    t("qs count")(qs.count())
    val joined = e.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", dotQ(col("qq"), col("q")))
      .withColumn("cos", cosineFromQ(col("dot"), col("qn2"), col("n2")))
    t("cross+dot count")(joined.count())
    t("cross+dot noop")(joined.write.format("noop").mode("overwrite").save())
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val ranked = joined.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("rn"), col("vec_id"), col("dot"), col("cos"))
    t("window noop")(ranked.write.format("noop").mode("overwrite").save())
    t("window+sort noop")(ranked.orderBy(col("qid"), col("rn"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
