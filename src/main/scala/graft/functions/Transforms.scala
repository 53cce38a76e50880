package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-to-record transforms — the SMT equivalents (SURVEY.md §2.6).
  * Each is a schema/column projection, so it composes with any query and
  * stays inside Catalyst (no row-at-a-time plugin machinery needed).
  */
object Transforms {

  /** M3 `ToLowerCaseNameConverter`: lower-case every column name. */
  def toLowerCaseNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** Upper-case variant (used to prove M3 roundtrips). */
  def toUpperCaseNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toUpperCase): _*)

  private def structFields(df: DataFrame, structCol: String): Seq[Column] = {
    import org.apache.spark.sql.types.StructType
    df.schema(structCol).dataType.asInstanceOf[StructType].fieldNames.toSeq
      .map(f => col(s"$structCol.$f").as(f))
  }

  /** M4 `KeyToValueConverter`: copy key-struct fields into the value
    * struct (appended after the existing value fields).
    */
  def keyToValue(df: DataFrame, keyCol: String = "key",
      valueCol: String = "value"): DataFrame =
    df.withColumn(valueCol,
      struct(structFields(df, valueCol) ++ structFields(df, keyCol): _*))

  /** M5 `HeaderToFieldConverter`: promote metadata columns into the value
    * struct as fields.
    */
  def headersToFields(df: DataFrame, headerCols: Seq[String],
      valueCol: String = "value"): DataFrame =
    df.withColumn(valueCol,
      struct(structFields(df, valueCol) ++ headerCols.map(c => col(c).as(c)): _*))

  /** P8 name sanitation: Avro-legal identifiers ([A-Za-z_][A-Za-z0-9_]*). */
  def sanitizeNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitizeName): _*)

  def sanitizeName(name: String): String = {
    val cleaned = name.map(c =>
      if (c.isLetterOrDigit && c < 128 || c == '_') c else '_')
    if (cleaned.isEmpty || cleaned.head.isDigit) "_" + cleaned else cleaned
  }

  /** K1 topic-name mappers (reference: Kafka{Default,Single,Flexible}
    * TopicNameMapper) as column expressions for `writeStream.format
    * ("kafka")`'s `topic` column.
    */
  def defaultTopicName(table: Column, prefix: String = "",
      delimiter: String = "_"): Column =
    when(lit(prefix) === "", regexp_replace(table, "\\.", delimiter))
      .otherwise(concat(lit(prefix), lit(delimiter),
        regexp_replace(table, "\\.", delimiter)))

  def singleTopicName(topic: String): Column = lit(topic)

  def flexibleTopicName(table: Column, mapping: Map[String, String],
      fallbackPrefix: String = ""): Column =
    mapping.foldLeft(defaultTopicName(table, fallbackPrefix)) {
      case (acc, (topic, tbl)) => when(table === tbl, lit(topic)).otherwise(acc)
    }
}
