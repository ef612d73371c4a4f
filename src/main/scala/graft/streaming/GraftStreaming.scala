package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.format.GraftDataset

/** Structured-Streaming integration — an ABOVE-PARITY extension: the
  * reference has no streaming at all (SURVEY.md §2.13); its closest
  * analogue is incremental append + incremental index update. Here a
  * stream lands in the versioned format with one commit per epoch, so
  * every micro-batch is a queryable, diffable snapshot and downstream
  * index maintenance can key off commit ids exactly like batch appends.
  */
object GraftStreaming {

  /** Append a streaming DataFrame into a versioned table, committing once
    * per micro-batch (epoch). `foreachBatch` gives exactly-once appends
    * per epoch id under checkpoint recovery as long as the commit message
    * encodes the epoch (idempotent re-run = same epoch id → skip).
    */
  def appendStream(stream: DataFrame, ds: GraftDataset,
                   checkpointDir: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val marker = s"stream epoch $epoch"
        if (!ds.log.exists(_.message == marker)) { // idempotent on retry
          ds.append(batch)
          ds.commit(marker)
          ()
        }
      }
      .start()

  /** Watermarked sliding/tumbling-window counts over an event stream —
    * the canonical late-data-tolerant streaming aggregation.
    */
  def windowedCounts(stream: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** Streaming exact dedup: drops rows whose `keyCols` were already seen
    * within the watermark horizon — state is expired by the watermark, so
    * memory stays bounded while duplicates separated by more than the
    * horizon pass through (the standard streaming-dedup contract). The
    * batch twin is `Dedup.exact`/`dedupCorpus`.
    */
  def dedupStream(stream: DataFrame, tsCol: String, watermark: String,
                  keyCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stateful per-key sessionization via flatMapGroupsWithState lives in
    * [[Sessionize]] (kept separate: it needs typed encoders).
    */
}
