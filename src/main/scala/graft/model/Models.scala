package graft.model

/** Typed row models for graft.
  *
  * `EditEvent` mirrors the reference's event POJO
  * (reference: src/main/java/xyz/delamater/EditEvent.java:3-13) — the
  * JSON payload of the Wikipedia recent-changes feed. Used by the
  * streaming surface; the batch surface is schema-dynamic DataFrames.
  */
final case class EditEvent(
    id: String,
    domain: String,
    namespace: String,
    title: String,
    timestamp: java.sql.Timestamp,
    user_name: String,
    user_type: String,
    old_length: Long,
    new_length: Long)

/** Output row of the windowed edit-size aggregation (reference:
  * src/main/java/xyz/delamater/DataStreamJob.java:101-106 emits
  * {domain, edit_size, start, end}).
  */
final case class WindowedEditSize(
    domain: String,
    edit_size: Long,
    start: java.sql.Timestamp,
    end: java.sql.Timestamp)
