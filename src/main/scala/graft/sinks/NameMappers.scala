package graft.sinks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{length, lit, ltrim, substring_index, when}

/** Topic / table name mapping + identifier sanitation (SURVEY.md §2.5 K1,
  * K5; §2.3 P8).
  *
  * Re-expresses the reference's three topic mappers
  * (`KafkaDefaultTopicNameMapper.java:43`, `KafkaSingleTopicNameMapper
  * .java:35`, `KafkaFlexibleTopicNameMapper.java:40`), the RAC
  * partition rule (partition = THREAD#−1, `doc/parameters.adoc:77-81`),
  * the sink-side table-name mappers (`DefaultTableNameMapper.java:86`,
  * `NameFromSchemaTableNameMapper.java:105`), and Avro-legal name fixing
  * (`OraCdcColumn.java:153-167`; `utils/KafkaUtils.java:36`).
  */
object NameMappers {

  /** P8: sanitize to an Avro/Protobuf-legal identifier — first char
    * [A-Za-z_] (else a '_' is prepended), the rest [A-Za-z0-9_] with
    * every illegal char replaced by '_'.
    */
  def sanitize(name: String): String = {
    require(name.nonEmpty, "empty identifier")
    val sb = new StringBuilder(name.length + 1)
    val c0 = name.charAt(0)
    if (!(c0.isLetter && c0 < 128) && c0 != '_') sb += '_'
    name.foreach { c =>
      if ((c.isLetterOrDigit && c < 128) || c == '_') sb += c else sb += '_'
    }
    sb.result()
  }

  /** K1 default mapper: [prefix ⧺ delimiter] ⧺ sanitize(owner_table).
    * `table` is the dotted "OWNER.TABLE" (or "PDB.OWNER.TABLE") form.
    */
  def defaultTopic(table: String, prefix: String = "",
      delimiter: String = "_"): String = {
    // drop empty components (a stray/leading/double dot) instead of
    // feeding sanitize's empty-identifier require: the codegen twin
    // (KafkaContractSink.defaultTopicColumn) drops them — "PDB..T"
    // must map to the SAME topic on both paths, and Java's split also
    // silently swallows TRAILING empties, so throwing here was never
    // consistent to begin with
    val base = table.split("\\.").filter(_.nonEmpty)
      .map(sanitize).mkString(delimiter)
    if (prefix.isEmpty) base else s"${sanitize(prefix)}$delimiter$base"
  }

  /** K1 single-topic mapper: everything to one topic. */
  def singleTopic(topic: String): String = topic

  /** K1 flexible mapper: explicit topic → table-pattern list (with
    * `%`/`*` wildcards); first match wins, else the default mapping.
    */
  def flexibleTopic(mapping: Seq[(String, Seq[String])],
      table: String, prefix: String = "", delimiter: String = "_"): String =
    mapping.collectFirst {
      case (topic, patterns) if patterns.exists(matches(_, table)) => topic
    }.getOrElse(defaultTopic(table, prefix, delimiter))

  /** RAC: Kafka partition = redo THREAD# − 1. */
  def racPartition(thread: Int): Int = {
    require(thread >= 1, s"redo threads are 1-based, got $thread")
    thread - 1
  }

  /** K5 default sink mapper: topic → table by stripping the prefix. */
  def tableFromTopic(topic: String, prefix: String = ""): String =
    if (prefix.nonEmpty && topic.startsWith(prefix))
      topic.substring(prefix.length).dropWhile(c => c == '_' || c == '.')
    else topic

  /** K5 from-schema mapper: last dotted component of the value-schema
    * name ("com.example.SCOTT.DEPT" → "DEPT").
    */
  def tableFromSchemaName(schemaName: String): String =
    schemaName.substring(schemaName.lastIndexOf('.') + 1)

  // ---- Column mirrors of the K5 mappers, for applying the mapping to
  // a record STREAM (billions of rows) with codegen'd builtins instead
  // of a per-row Scala call. `NameMapperColumnProps` property-ties each
  // mirror to its driver-side function above, so the two can never
  // silently diverge. ----

  /** Column mirror of [[tableFromTopic]]. */
  def tableFromTopicCol(topic: Column, prefix: String): Column =
    if (prefix.isEmpty) topic
    else when(topic.startsWith(lit(prefix)),
      ltrim(topic.substr(lit(prefix.length + 1), length(topic)), "_."))
      .otherwise(topic)

  /** Column mirror of [[tableFromSchemaName]] — `substring_index` with a
    * negative count keeps everything after the last '.', and the whole
    * string when no '.' exists, exactly like `lastIndexOf + 1`.
    */
  def tableFromSchemaNameCol(schemaName: Column): Column =
    substring_index(schemaName, ".", -1)

  private def matches(pattern: String, table: String): Boolean =
    graft.util.Wildcards.regex(pattern).findFirstIn(table).isDefined
}
