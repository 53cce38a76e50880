package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.cdc.{EmittedChange, Ops}

/** Change-event envelope shapers (SURVEY.md §2.3 P6/P7; reference:
  * `KafkaStructDataBinder.java:131-204` and the kafka/single/debezium
  * binders). Pure column projections — Catalyst prunes unused fields and
  * the whole shaping stays inside codegen.
  */
object Envelopes {

  private def opLetter(op: Column): Column =
    when(op === Ops.Insert, lit("c"))
      .when(op === Ops.Delete, lit("d"))
      .when(op === Ops.Update, lit("u"))
      .otherwise(lit("?"))

  private def opName(op: Column): Column =
    when(op === Ops.Insert, lit("INSERT"))
      .when(op === Ops.Delete, lit("DELETE"))
      .when(op === Ops.Update, lit("UPDATE"))
      .when(op === Ops.Ddl, lit("DDL"))
      .otherwise(lit("UNKNOWN"))

  /** Debezium-style envelope: before/after/source/op/ts_ms. DDL records
    * are FILTERED — they are schema metadata, not row changes (Debezium
    * routes them to a schema-change topic, never the data topics); the
    * registry/history path ([[graft.cdc.SchemaRegistry]]) consumes them,
    * and an op="?" record would fail schema-validated consumers.
    */
  def debezium(changes: Dataset[EmittedChange], instance: String): DataFrame =
    changes.filter(col("op") =!= Ops.Ddl).select(
      col("before"),
      col("after"),
      struct(
        lit(instance).as("instance"),
        col("table").as("table"),
        col("scn").as("scn"),
        col("commitScn").as("commit_scn"),
        col("xid").as("xid"),
        col("rowId").as("row_id")).as("source"),
      opLetter(col("op")).as("op"),
      (col("tsMicros") / 1000L).cast("long").as("ts_ms"))

  /** Kafka-connector-style envelope: key struct + value struct. The key
    * reads each key column from the op's primary image, FALLING BACK to
    * the other image: a partial UPDATE's after-image carries only its
    * SET columns (the key lives in the before/undo image unless the key
    * itself was updated), and a key built from the after-image alone
    * would hash such updates to a different partition than the row's
    * INSERT/DELETE — breaking Kafka per-key ordering and compaction.
    */
  def kafkaKeyValue(changes: Dataset[EmittedChange], keyCols: Seq[String]): DataFrame = {
    val img = when(col("op") === Ops.Delete, col("before")).otherwise(col("after"))
    val alt = when(col("op") === Ops.Delete, col("after")).otherwise(col("before"))
    val keyEntries = array(keyCols.map(k => struct(
      lit(k).as("key"),
      coalesce(element_at(img, k), element_at(alt, k)).as("value"))): _*)
    // DDL filtered like [[debezium]]/[[wrapped]]: a transiting ALTER
    // carries no key columns, so every schema change would land on the
    // EMPTY compaction key of its data topic (clobbering each other and
    // failing schema-validated consumers) — schema metadata is not a
    // row change
    changes.filter(col("op") =!= Ops.Ddl).select(
      col("table"),
      map_from_entries(filter(keyEntries, e => e("value").isNotNull)).as("key"),
      img.as("value"),
      opName(col("op")).as("operation"))
  }

  /** Wrapped-schema envelope (SURVEY §1.2 regime 3; reference
    * `KafkaWrappedSchemas.java:60-94`): every present column is wrapped in
    * a single-field struct V, so "column absent from redo" (no map entry)
    * stays distinguishable from "column is NULL" (entry with V = null) —
    * the contract partial-update sinks (K4) rely on.
    */
  def wrapped(changes: Dataset[EmittedChange]): DataFrame =
    // DDL filtered like [[debezium]]: K4 partial-update sinks treat any
    // non-"d" op as an upsert, so a transiting ALTER TABLE would insert
    // a spurious key-only row
    changes.filter(col("op") =!= Ops.Ddl).select(
      col("table"), col("xid"), col("scn"), col("commitScn").as("commit_scn"),
      opLetter(col("op")).as("op"),
      transform_values(col("before"), (_, v) => struct(v.as("V"))).as("before_w"),
      transform_values(col("after"), (_, v) => struct(v.as("V"))).as("after_w"))

  /** Pseudo-columns (P7): audit/meta fields appended to the value image.
    * The session-audit fields (username, osUsername, hostname,
    * auditSessionId, clientId — ref `OraCdcChangeAudit.java`,
    * `KafkaPseudoColumnsProcessor.java:82-249`) come from the
    * transaction's 5.19 audit vector, stamped onto each change by the
    * assembler; NULL when the stream carried no audit record.
    */
  def withPseudoColumns(changes: Dataset[EmittedChange]): DataFrame =
    changes.select(
      col("xid").as("ORA_XID"),
      col("scn").as("ORA_SCN"),
      col("commitScn").as("ORA_COMMIT_SCN"),
      col("rowId").as("ORA_ROW_ID"),
      opName(col("op")).as("ORA_OPERATION"),
      (col("tsMicros") / 1000L).cast("long").as("ORA_TS_MS"),
      element_at(col("audit"), "username").as("ORA_USERNAME"),
      element_at(col("audit"), "osUsername").as("ORA_OS_USERNAME"),
      element_at(col("audit"), "hostname").as("ORA_HOSTNAME"),
      element_at(col("audit"), "auditSessionId").cast("long")
        .as("ORA_AUDIT_SESSION_ID"),
      element_at(col("audit"), "clientId").as("ORA_CLIENT_ID"),
      col("table"),
      col("before"),
      col("after"))
}
