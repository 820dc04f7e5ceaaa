package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Relational

/** H12: streaming sketch maintenance — the count-min cell table kept up
  * to date by the stream itself, so heavy hitters are served from a
  * fixed-size state table without ever re-scanning raw history.
  *
  * Exactly-once by LAYOUT, not by fencing: each micro-batch sketches its
  * own rows ([[Relational.cmsCells]] — one digest per row, partial agg)
  * and writes them under `batch_id=<id>` with a DYNAMIC partition
  * overwrite, so a replayed batch (crash between sink write and
  * checkpoint commit) replaces its own subtree instead of double-adding
  * — the additive analogue of the A6b exactly-once sink. Serving merges
  * cells across batch partitions with an integer sum, which is
  * associative and commutative, so the served sketch is BIT-IDENTICAL
  * to the one-shot batch sketch over the same rows, whatever the
  * batching (asserted exactly in the spec — the streaming counterpart
  * of b35_cms_merge's shared-oracle proof).
  *
  * Scale: per batch the exchange carries ≤ depth×2^17 integer cells per
  * partition; the state table grows by ≤ 4 MB per micro-batch and is
  * re-compactable with A13 (it IS a partitioned parquet sink) — but
  * only with the stream STOPPED: A13 is a single-writer op, and a
  * micro-batch committing mid-compaction would be silently dropped by
  * the swap (see [[graft.sources.Tables.compactPartitioned]]).
  */
object SketchStream {

  /** Run the maintenance stream: sketch each micro-batch of `stream` on
    * `keyCol`, land cells under `cellsDir/batch_id=<id>/`.
    */
  def maintainCms(stream: DataFrame, keyCol: String, cellsDir: String,
                  checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Relational.cmsCells(batch, keyCol)
          .withColumn("batch_id", lit(id))
          .repartition(col("batch_id"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(cellsDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Serve heavy hitters from the maintained cell table: cell-wise sum
    * across batch partitions (integer — exact), then the same
    * threshold estimate the batch sketch uses. `keyed` supplies the
    * candidate key set (typically the dimension table or the distinct
    * keys of the period under investigation — never raw history).
    */
  def heavyHittersFromCells(keyed: DataFrame, cellsDir: String,
                            keyCol: String, threshold: Long): DataFrame = {
    val merged = keyed.sparkSession.read.parquet(cellsDir)
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    Relational.cmsThresholdEstimate(keyed, merged, keyCol, threshold)
  }
}
