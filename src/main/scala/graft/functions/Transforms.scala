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

  /** M6 LOB transformation hook (the reference's pluggable
    * `a2.lob.transformation` interface, applied per LOB column at emit):
    * the caller supplies a `Column => Column`. Because the hook is a
    * COLUMN function, a transform built from builtin/codegen expressions
    * stays inside whole-stage codegen — the row-at-a-time plugin calling
    * convention the reference uses would fence off codegen around every
    * LOB-bearing projection.
    */
  def lobTransform(df: DataFrame, lobCols: Seq[String],
      f: Column => Column): DataFrame =
    lobCols.foldLeft(df)((d, c0) => d.withColumn(c0, f(col(c0))))

  /** P8 name sanitation: Avro-legal identifiers ([A-Za-z_][A-Za-z0-9_]*). */
  def sanitizeNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitizeName): _*)

  def sanitizeName(name: String): String = {
    val cleaned = name.map(c =>
      if (c.isLetterOrDigit && c < 128 || c == '_') c else '_')
    if (cleaned.isEmpty || cleaned.head.isDigit) "_" + cleaned else cleaned
  }

  // NOTE: unlike Wildcards.matcher, an EMPTY pattern list here matches
  // NOTHING — a converter with no patterns must convert no fields
  private def fieldMatcher(patterns: Seq[String]): String => Boolean = {
    val regexes = patterns.map(graft.util.Wildcards.regex)
    n => regexes.exists(_.findFirstIn(n).isDefined)
  }

  /** M1 `OraNumberConverter`: every BinaryType column whose name matches
    * one of the `%`-patterns is decoded from Oracle NUMBER bytes to the
    * target type ("decimal(p,s)" / "long" / "double") — the
    * field-pattern SMT (`kafka/transforms/OraNumberConverter.java:72-495`)
    * as a schema projection.
    */
  def convertOraNumberFields(df: DataFrame, patterns: Seq[String],
      target: String): DataFrame = {
    import org.apache.spark.sql.types.BinaryType
    val m = fieldMatcher(patterns)
    val dec = """decimal\((\d+),(\d+)\)""".r
    df.select(df.schema.fields.map { f =>
      if (f.dataType == BinaryType && m(f.name)) (target.toLowerCase match {
        case dec(p, s) => OracleFunctions.oranumber_to_decimal(col(f.name), p.toInt, s.toInt)
        case "long" => OracleFunctions.oranumber_to_long(col(f.name))
        case "double" => OracleFunctions.oranumber_to_double(col(f.name))
        case other => throw new IllegalArgumentException(s"bad target $other")
      }).as(f.name)
      else col(f.name)
    }.toSeq: _*)
  }

  /** M2 `OraIntervalConverter`: matching BinaryType columns decode from
    * Oracle INTERVAL bytes — "ym" → months (int), "ds" → micros (long).
    */
  def convertOraIntervalFields(df: DataFrame, patterns: Seq[String],
      kind: String): DataFrame = {
    import org.apache.spark.sql.types.BinaryType
    val m = fieldMatcher(patterns)
    df.select(df.schema.fields.map { f =>
      if (f.dataType == BinaryType && m(f.name)) (kind.toLowerCase match {
        case "ym" => OracleFunctions.orainterval_ym_months(col(f.name))
        case "ds" => OracleFunctions.orainterval_ds_micros(col(f.name))
        case other => throw new IllegalArgumentException(s"bad kind $other")
      }).as(f.name)
      else col(f.name)
    }.toSeq: _*)
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

  /** topic→table routing with caller-controlled precedence: `mapping` is
    * a SEQ, not a Map — when two topics claim the same table the FIRST
    * entry wins, deterministically (a Map's iteration order would route
    * rows to an arbitrary topic on hash-order ties).
    */
  def flexibleTopicName(table: Column, mapping: Seq[(String, String)],
      fallbackPrefix: String = ""): Column =
    mapping.foldRight(defaultTopicName(table, fallbackPrefix)) {
      case ((topic, tbl), acc) => when(table === tbl, lit(topic)).otherwise(acc)
    }
}
