package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline run-log ingestion and upload — the analog of the reference's
  * etl/upload_log.py: read a JSON-Lines log file into a DataFrame (lines
  * that fail to parse survive in a `raw` column instead of being dropped,
  * upload_log.py:58-82 `read_log_to_df`), then push it to a record-level
  * sink in bounded batches (upload_log.py:86-107 `upload_df_to_supabase`,
  * chunks of 500) through [[Load.writeWithRetries]]'s retry envelope.
  */
object RunLog {

  /** JSON-Lines log → DataFrame. Valid lines contribute their fields to
    * the unioned schema; invalid lines land whole in `raw` — Spark's
    * PERMISSIVE corrupt-record column is exactly the reference's
    * `{"raw": line}` fallback, so nothing in a noisy log is lost.
    */
  def readLogDf(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "raw")
      .json(path)

  /** Read the log and load it through the batched retry writer. The
    * reference chunks at 500 rows to bound payload size; retries/shrink
    * come free from [[Load.writeWithRetries]]. `sleeper` passes through
    * to the retry envelope (injectable for tests and rate shaping, as on
    * writeWithRetries itself).
    */
  def uploadLog(spark: SparkSession, path: String, writer: Load.BatchWriter,
      batchSize: Int = 500,
      sleeper: Int => Unit = s => Thread.sleep(s * 1000L)): Load.LoadResult =
    Load.writeWithRetries(readLogDf(spark, path), writer,
      batchSize = batchSize, sleeper = sleeper)
}
