package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** H20: streaming vector-index maintenance — the ingestion half of a
  * vector store: embeddings arriving on a stream are cell-assigned
  * against the index's PINNED centroid model (read once at stream
  * start — cell geometry must never drift between micro-batches, the
  * H12 shared-arithmetic rule: the assignment expression is the same
  * `Similarity.assignCells` the batch build uses) and landed under the
  * index's delta layout partitioned by `(cell, batch_id)` with dynamic
  * partition overwrite — a replayed micro-batch replaces exactly its
  * own subtree, so the delta is exactly-once BY LAYOUT (A6b's sink
  * discipline), with no read-modify-write of existing cells.
  *
  * Serving reads base ∪ delta with the same cell pruning as the
  * one-shot probe: query I/O stays nProbes cells of base plus nProbes
  * cells of delta regardless of how many batches have landed. A
  * compaction that folds delta files into the base layout is the A13
  * small-file pass applied per cell directory — same machinery, no new
  * semantics.
  */
object IndexStream {

  /** Maintain `dir`'s delta from a stream of (vec_id, embedding) rows.
    * Runs AvailableNow (drains the backlog then stops) — swap the
    * trigger for a continuous deployment.
    */
  def maintainIvfIndex(stream: DataFrame, dir: String,
                       checkpoint: String): StreamingQuery = {
    val spark = stream.sparkSession
    val cents = Similarity.readCentroids(spark, dir)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spk = batch.sparkSession
        val prev = spk.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spk.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try {
          Similarity.assignCells(Similarity.withNorm(batch), cents)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .partitionBy("cell", "batch_id")
            .parquet(s"$dir/delta")
        } finally {
          prev match {
            case Some(v) => spk.conf.set("spark.sql.sources.partitionOverwriteMode", v)
            case None => spk.conf.unset("spark.sql.sources.partitionOverwriteMode")
          }
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Fold the accumulated delta into the base layout — the A13
    * small-file compaction applied to the index: base ∪ delta rewritten
    * as one `cell=`-partitioned table through a staging directory (the
    * crash-safe swap: the live `vectors` path is replaced only after
    * the full rewrite lands), then the delta is cleared. Probes before
    * and after serve identical results (spec'd bit-exact); run it when
    * delta file counts start to dominate probe I/O — the same trigger
    * A13 uses for partitioned sinks.
    */
  def compactIndexDelta(spark: SparkSession, dir: String): Unit = {
    val cols = Seq("vec_id", "embedding", "nrm", "cell").map(col)
    val base = spark.read.parquet(s"$dir/vectors").select(cols: _*)
    val delta =
      try Some(spark.read.parquet(s"$dir/delta").select(cols: _*))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    if (delta.isEmpty) return
    val staged = s"$dir/vectors_staging"
    base.unionByName(delta.get)
      .write.mode("overwrite").partitionBy("cell").parquet(staged)
    // swap: the staged tree becomes the live one, then the delta goes
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/vectors")
    fs.delete(live, true)
    fs.rename(new org.apache.hadoop.fs.Path(staged), live)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/delta"), true)
  }

  /** Probe base ∪ delta with an external query vector — the serve path
    * of the maintained index. Identical routing/scoring/ordering to
    * `Similarity.probeIvfIndexVec`; both legs prune to the probe
    * cells (partition filters on `cell=`).
    */
  def probeMaintained(spark: SparkSession, dir: String, qVec: Array[Float],
                      k: Int, nProbes: Int = 2): DataFrame = {
    val cents = Similarity.readCentroids(spark, dir)
    val qNrm = math.sqrt(qVec.map(x => x.toDouble * x.toDouble).sum)
    require(qNrm > 0, "query vector has zero norm")
    val probeCells = Similarity.probeCellsFor(cents, qVec, qNrm, nProbes)
    val base = spark.read.parquet(s"$dir/vectors")
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val delta =
      try Some(spark.read.parquet(s"$dir/delta")
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cell")))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    delta.fold(base)(base.unionByName(_))
      .filter(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), col("cell").cast("int").as("cell"),
        (Similarity.dot(col("embedding"), typedLit(qVec.toSeq))
          / (col("nrm") * lit(qNrm))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }
}
