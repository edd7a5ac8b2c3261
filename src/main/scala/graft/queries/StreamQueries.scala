package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamOps

/** Batch twins of the streaming transforms (SURVEY.md §2.4). The SAME
  * functions run inside readStream pipelines (StreamingSpec); running them
  * here in batch lets the driver oracle-check their logic.
  */
object StreamQueries {

  val all: Seq[Q] = Seq(

    // 42: canonicalize (the streaming ingest transform)
    Q("st_canonicalize",
      (s, dir) => StreamOps.canonicalizeEvents(Tables.events(s, dir))
        .select(col("event_id"), col("event_type"), col("business_key"))
        .orderBy(col("event_id")),
      Some("""
        SELECT event_id, trim(event_type) AS event_type,
               concat_ws('|', CAST(user_id AS VARCHAR), trim(event_type),
                         CAST(ts AS VARCHAR)) AS business_key
        FROM events ORDER BY event_id
      """)),

    // 43: watermarked tumbling window agg (batch mode: all windows closed)
    Q("st_windowed_agg",
      (s, dir) => StreamOps.windowedAgg(Tables.events(s, dir))
        .orderBy(col("window_start"), col("event_type")),
      Some("""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2 ORDER BY window_start, event_type
      """))
  )
}
