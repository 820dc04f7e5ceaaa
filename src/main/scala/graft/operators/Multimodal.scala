package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing: image/audio/video payloads ride along as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract runs as a partition-local batched transform.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `stubDecode` produces deterministic fake features from the bytes.
  * Everything around it is real and is what matters at scale: the schema,
  * the binary column lifecycle, the mapPartitions batching shape (batch
  * size bounds peak memory per task — the same shape a Pandas-UDF /
  * Arrow-batch decode uses), and the fact that payload bytes never pass
  * through a shuffle or the driver.
  */
object Multimodal {

  /** Typed row for the media table: payload + metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String,
                      width: Int, height: Int)

  /** Decoded feature row (fixed-width, shuffle-friendly — the heavy
    * payload column is dropped as soon as features are extracted).
    */
  case class MediaFeatures(doc_id: Long, format: String, width: Int, height: Int,
                           n_bytes: Long, feat_mean: Double, feat_first: Double)

  /** Attach a binary payload + typed metadata to each document. Width and
    * height are deterministic pseudo-metadata derived from the doc id and
    * payload byte length (a real pipeline reads them from the container
    * header); the derivation is plain integer arithmetic so the resize /
    * frame-sample plumbing downstream has an exact SQL oracle twin.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/rgb8").as("format"),
      (pmod(col("doc_id") * 131L + octet_length(col("text")) * 7L, lit(896L)) + 64L)
        .cast("int").as("width"),
      (pmod(col("doc_id") * 239L + octet_length(col("text")) * 11L, lit(896L)) + 64L)
        .cast("int").as("height"))

  /** STUB decode: deterministic fake features standing in for a codec.
    * A real deployment swaps this one function for the actual pixel
    * decode; the fake keeps the full dataflow testable without codec
    * libraries.
    */
  private def stubDecode(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    val mean = if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    MediaFeatures(r.doc_id, r.format, r.width, r.height, bytes.length.toLong,
      mean, if (bytes.isEmpty) 0.0 else (bytes(0) & 0xff).toDouble)
  }

  /** Partition-local batched decode. `batchSize` bounds how many payloads
    * are resident per task at once — the Arrow/Pandas batch shape — so a
    * 100 TB corpus streams through fixed memory.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => batch.map(stubDecode) }
    }
  }

  /** STUB resize: a real implementation decodes pixels and rescales; the
    * stub halves the metadata dims and subsamples the payload bytes
    * proportionally. The Spark-side shape is the real thing: a pure
    * per-row binary transform whose output payload is strictly smaller —
    * the size-reduction contract downstream stages rely on.
    */
  def resize(media: DataFrame, factor: Int = 2): DataFrame =
    media.select(
      col("doc_id"), col("format"),
      (col("width") / factor).cast("int").as("width"),
      (col("height") / factor).cast("int").as("height"),
      expr(s"substring(payload, 1, greatest(1, ceil(length(payload) / ${factor * factor})))")
        .as("payload"))

  /** Frame sampling: the payload treated as a fixed-frame-size container;
    * every `every`-th frame is exploded into its own row. Pure
    * expressions — the per-row frame index sequence is generated and
    * pruned before any bytes move, and each output row carries only its
    * own frame slice (never the whole payload through the shuffle).
    */
  def frameSample(media: DataFrame, frameBytes: Int = 64, every: Int = 4): DataFrame =
    media
      // row guard (empty payload ⇒ zero frames — sequence(0,0) would
      // fabricate one) + _outer: frame 0 always survives the stride
      // filter, so the ids array is provably non-empty, and the plain
      // form's inferred filter re-runs the id build in the scan
      // (§6b round-15)
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"),
        expr(
          s"filter(sequence(0, cast(ceil(length(payload) / $frameBytes) as int) - 1), i -> i % $every = 0)")
          .as("frame_ids"))
      .select(col("doc_id"), col("payload"), explode_outer(col("frame_ids")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame"),
        expr(s"length(substring(payload, frame_idx * $frameBytes + 1, $frameBytes))")
          .cast("long").as("frame_bytes"))

  /** G10: frame-level media dedup — g3's frame decomposition crossed
    * with d1's exact-digest dedup and c27's grouped pair expansion:
    * two videos share CONTENT when they share frames, even when the
    * containers differ (re-encoded copies with trimmed intros, clips
    * lifted into compilations). Every payload explodes into fixed-size
    * frames (every=1 — dedup wants ALL frames, unlike g3's sampling),
    * each frame digests row-locally (payload bytes never shuffle —
    * only 16-byte digests), identical digests bucket together on one
    * keyed shuffle, and in-cell pair expansion under the c27 hub cap
    * (a ubiquitous intro/black frame must not explode quadratically —
    * capped cells drop, part of the checked semantics) yields per-pair
    * shared-frame counts. Containment is d20's asymmetric statistic at
    * the media level: shared / |distinct frames of A| — a clip wholly
    * contained in a longer video scores containment_a = 1.0 while its
    * Jaccard is diluted away. Distinct (doc, digest) first, so a frame
    * repeated WITHIN one video counts once (set semantics, matching
    * d20). Portability: counts are exact longs; the two containments
    * are single IEEE divisions of integer casts.
    */
  def sharedFrameDedup(media: DataFrame, frameBytes: Int = 64,
                       minShared: Int = 2, maxBucket: Int = 64): DataFrame = {
    val fd = frameSample(media, frameBytes, every = 1)
      .select(col("doc_id"), md5(col("frame")).as("fh"))
      .distinct()
    val counts = fd.groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    val pairs = fd.groupBy(col("fh"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      // _outer: non-empty by the size guard; a plain explode's inferred
      // filter re-expands every cell a second time (§6b round-15).
      // pair_expand is the r16 native form of the nested-HOF expansion
      // (same pairs, same order)
      .select(explode_outer(graft.functions.PairFunctions.pairExpand(
        col("ids"), "doc_a", "doc_b")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
    pairs
      .join(counts.select(col("doc_id").as("doc_a"), col("n_frames").as("frames_a")),
        Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n_frames").as("frames_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared_frames"),
        col("frames_a"), col("frames_b"),
        (col("shared_frames").cast("double") / col("frames_a").cast("double"))
          .as("containment_a"),
        (col("shared_frames").cast("double") / col("frames_b").cast("double"))
          .as("containment_b"))
  }

  /** G11: shared-CLIP detection — the temporal refinement of G10: two
    * videos share a CLIP when they share a contiguous, order-preserving
    * RUN of frames, not just a frame set (G10's set containment can't
    * tell a lifted 10-second clip from scattered stock frames). The
    * classic alignment shape: per-doc ordered frame digests roll into
    * `shingle`-frame signatures (order-sensitive — a reshuffled copy
    * shares frames but NO shingles), matching signatures across docs
    * give (pos_a, pos_b) anchor points, and anchors on one DIAGONAL
    * (constant pos_b − pos_a) with consecutive positions form an
    * aligned run — gaps-and-islands (b44's recipe) per (pair, offset)
    * recovers the longest run exactly. The reported clip spans
    * run + shingle − 1 frames.
    *
    * Scale: payload bytes never shuffle (frames digest row-locally; the
    * shingle signature is an md5 over three digests — 16 B keys); cell
    * expansion rides the c27/g10 occurrence cap, so a ubiquitous
    * intro/black-frame shingle drops instead of exploding; the island
    * windows partition by (pair, offset) over the OUTPUT-sized match
    * table. Portability: positions/counts are exact longs; the one
    * argmax (longest run, ties → smallest offset then start) uses
    * integer sort keys only, so both engines pick the same clip.
    */
  def sharedClips(media: DataFrame, frameBytes: Int = 64, shingle: Int = 3,
                  minRun: Int = 2, maxBucket: Int = 64): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val frames = frameSample(media, frameBytes, every = 1)
      .select(col("doc_id"), col("frame_idx"), md5(col("frame")).as("fh"))
    val wDoc = W.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val leadCols = (1 until shingle).map(i =>
      lead(col("fh"), i).over(wDoc).as(s"fh$i"))
    val sh = frames
      .select(col("doc_id") +: col("frame_idx").cast("long").as("pos") +:
        col("fh") +: leadCols: _*)
      .filter(col(s"fh${shingle - 1}").isNotNull)
      .select(col("doc_id"), col("pos"),
        md5(concat_ws("|",
          col("fh") +: (1 until shingle).map(i => col(s"fh$i")): _*)).as("sh"))
    // the alignment close (anchor pairs → diagonal islands → per-pair
    // argmax) is unit-agnostic — shared with the text twin
    // (Dedup.sharedPassages) so the arithmetic exists exactly once
    Dedup.alignedRuns(sh, minRun, maxBucket, shingle, "clip_frames")
  }

  /** G12: low-diversity ("dead air") frame detection — the curation
    * screen for black frames, silence, test cards, and padding: a FULL
    * frame whose payload uses ≤ `maxDistinct` distinct byte values is
    * flagged flat, and per media item the op reports how much of it is
    * flat and the LONGEST consecutive flat run (a 30-frame black run is
    * dead air; 30 scattered dark frames are content). Tail fragments
    * are excluded from both numerator and denominator — a 3-byte tail
    * is trivially low-diversity and would pollute the signal.
    *
    * Plan: the whole op is ROW-LOCAL — every frame of a media item
    * lives in its one payload row, so the per-frame flags AND the
    * longest-run recurrence both compute inside the row: frames slice
    * from the hexed payload (byte-exact for ANY payload, not just
    * decodable text), diversity is distinct hex pairs, and the longest
    * consecutive flat run is a single left fold carrying
    * (current_run, best_run) — b44's gaps-and-islands collapsed to a
    * recurrence because the sequence is already in order in the array.
    * ZERO exchanges: where the first cut exploded frames into a
    * doc-keyed aggregate plus a rank window (two shuffles of flag
    * rows), this plan is a projection chain ending at the sink —
    * PlanSpec pins Exchange-freedom, and the rewrite doubles as a
    * stateless streaming admission gate (H25). Portability: counts are
    * exact longs; the one division is guarded at n_frames = 0. The
    * 15-byte default is sized against the generated corpus (frame
    * diversity p10 ≈ 15, so ~10% of frames flag — non-degenerate both
    * directions); real black/silent frames sit at 1–2 distinct bytes,
    * far under any sane threshold.
    */
  def flatFrames(media: DataFrame, frameBytes: Int = 64,
                 maxDistinct: Int = 15): DataFrame = {
    val hb = 2 * frameBytes // hex chars per frame
    media
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), hex(col("payload")).as("hx"))
      // stage 1: per-frame hex slices (the tail slice comes out short)
      .select(col("doc_id"),
        transform(
          sequence(lit(0),
            ceil(length(col("hx")) / lit(hb.toDouble)).cast("int") - 1),
          i => col("hx").substr(i * hb + 1, lit(hb))).as("fhx"))
      // stage 2: per-frame (full, flat) flags — diversity over hex pairs
      .select(col("doc_id"),
        transform(col("fhx"), fh => struct(
          (length(fh) === hb).as("full"),
          (length(fh) === hb &&
            size(array_distinct(transform(
              sequence(lit(1), (length(fh) / 2).cast("int")),
              j => fh.substr(j * 2 - 1, lit(2))))) <= maxDistinct)
            .as("flat"))).as("flags"))
      // stage 3: counts + the run recurrence (flags referenced 3× —
      // multiple refs keep CollapseProject from inlining stage 2)
      .select(col("doc_id"),
        size(filter(col("flags"), f => f.getField("full"))).cast("long")
          .as("n_frames"),
        size(filter(col("flags"), f => f.getField("flat"))).cast("long")
          .as("n_flat"),
        aggregate(col("flags"),
          struct(lit(0L).as("cur"), lit(0L).as("best")),
          (acc, f) => struct(
            when(f.getField("flat"), acc.getField("cur") + 1L).otherwise(lit(0L))
              .as("cur"),
            greatest(acc.getField("best"),
              when(f.getField("flat"), acc.getField("cur") + 1L).otherwise(lit(0L)))
              .as("best")),
          acc => acc.getField("best")).as("max_flat_run"))
      .select(col("doc_id"), col("n_frames"), col("n_flat"),
        when(col("n_frames") === 0, lit(0.0))
          .otherwise(col("n_flat").cast("double") / col("n_frames"))
          .as("flat_frac"),
        col("max_flat_run"))
  }

  /** Output row of the batched encoder: the vector plus the size of the
    * batch it was computed in (observable batching contract).
    */
  case class DocVec(doc_id: Long, embedding: Seq[Float], batch_size: Int)

  /** STUB batch encoder: one call per BATCH (not per row) — the contract
    * a model server / ONNX session needs. Deterministic 4-dim fake
    * features from byte statistics stand in for the real forward pass.
    */
  private def stubEncode(payloads: Seq[Array[Byte]]): Seq[Seq[Float]] =
    payloads.map { b =>
      if (b.isEmpty) Seq(0f, 0f, 0f, 0f)
      else Seq(
        b.length.toFloat,
        (b(0) & 0xff).toFloat,
        (b(b.length - 1) & 0xff).toFloat,
        (b.map(x => (x & 0xff).toLong).sum % 997L).toFloat)
    }

  /** G4: batched embedding inference plumbing. Rows are grouped into
    * fixed-size batches per partition and the encoder is invoked once
    * per batch with the whole batch — amortizing per-call overhead
    * (model-server round trip, GPU kernel launch) exactly like an
    * Arrow/Pandas batch UDF. `batchSize` bounds resident payload bytes
    * per task; the binary column never crosses a shuffle.
    */
  def embedBatched(media: DataFrame, batchSize: Int = 32): Dataset[DocVec] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = stubEncode(batch.map(_.payload))
        batch.zip(vecs).map { case (r, v) => DocVec(r.doc_id, v, batch.size) }
      }
    }
  }

  /** G5: perceptual fingerprint from the binary payload — the aHash
    * shape of image dedup: decode, sample a fixed-length code sequence,
    * threshold each code against the payload mean, fold the bits into
    * one 60-bit fingerprint (60 keeps the fold inside a non-negative
    * signed long, like every other house hash). With a real pixel
    * decode the codes become the 8×8 grayscale downsample; nothing
    * downstream changes. Row-local; the heavy payload never shuffles —
    * only the 8-byte fingerprint does.
    */
  def perceptualHash(media: DataFrame, bits: Int = 60): DataFrame =
    Dedup.spread(media)
      // octet_length needs no decode, and the binary is sliced BEFORE
      // decoding, so only `bits` bytes are ever decoded per row — on a
      // corpus of ~100 KB payloads that is the difference between
      // streaming 60 B and 100 KB per row through the codec (this
      // corpus is verified single-byte at every SF, so byte slicing
      // cannot split a character and octet length = char length; a
      // multi-byte corpus would slice after decode instead)
      .filter(octet_length(col("payload")) >= bits)
      .select(col("doc_id"), expr(
        s"""transform(filter(split(decode(substring(payload, 1, $bits), 'UTF-8'), ''),
           |          c -> c <> ''),
           |  c -> ascii(c))""".stripMargin).as("codes"))
      .select(col("doc_id"), col("codes"),
        (aggregate(col("codes"), lit(0), (a, x) => a + x).cast("double")
          / size(col("codes"))).as("payload_mean"))
      // payload_mean is referenced TWICE here — once inside the threshold
      // lambda and once as an output feature (the brightness analogue a
      // real aHash also reports) — which is what keeps CollapseProject
      // from inlining the 60-element mean fold into the per-element
      // lambda (the §6b single-reference trap: inlined, the mean would
      // re-evaluate per code element, ~60× the fold work)
      .select(col("doc_id"),
        aggregate(
          transform(col("codes"),
            c => when(c.cast("double") >= col("payload_mean"), lit(1L)).otherwise(lit(0L))),
          lit(0L), (acc, b) => acc * lit(2L) + b).as("phash"),
        col("payload_mean"))

  /** G5: near-duplicate payloads by perceptual-hash distance, banded —
    * the d2 pattern in hamming space: 4 bands × 15 bits bucket the
    * fingerprints (pairs agreeing on ANY full band become candidates,
    * never an O(n²) self-join), then the exact hamming verify runs on
    * candidates only. Candidate recall vs the all-pairs form is the
    * usual LSH trade (≤ maxHamming bits can straddle all 4 bands) —
    * measured in the spec; the banded form is the query surface and
    * has its own exact oracle (the SQL reproduces the banding).
    * A production run persists `perceptualHash` once (it is recomputed
    * per consumer here, cheap at bench scale).
    */
  // the last persisted fingerprint table: each phashNearDup call frees
  // its predecessor's cache blocks, so repeated invocations (bench
  // warm-up + reps + scaling sweep) pin at most ONE copy instead of
  // accumulating InMemoryRelations for the life of the session.
  // CONTRACT: build-then-execute, one in-flight result — constructing a
  // second phashNearDup before executing the first un-caches the first
  // (still CORRECT via lineage, but its joins re-derive the payload
  // scan). Callers needing interleaved results should persist the
  // fingerprints themselves.
  private var lastFp: Option[DataFrame] = None

  /** Degenerate-band hub cap (round-14 verdict item 4 — the one
    * exp_sf1 > 1.0 left): a (band_id, band_key) bucket larger than
    * this generates size²/2 candidates while carrying ~zero signal (a
    * 15-bit key shared by thousands of fingerprints is length-pattern
    * noise, the c27 hub class in banding form), and those buckets are
    * what made candidate volume super-linear — measured per decade:
    * 0.78M → 31.9M candidates (10× docs, 65% of the sf1 volume from
    * buckets > 400). Skipping them is the standard LSH
    * oversized-bucket rule; measured recall vs the uncapped banded
    * yardstick: 100% at sf0.001/sf0.01 (no bucket reaches the cap),
    * 97.2% at sf0.1, 80% at sf1 — the documented density/recall
    * trade, chosen over re-banding after measuring both (3×20-bit
    * bands cut candidates the same 4× but kept only 75% of verified
    * pairs at sf0.1; narrower bands grow candidates 3–5×). ONE
    * constant, interpolated into the SQL oracle, so engine and oracle
    * can never disagree on the cut.
    */
  val phashBucketCap = 400

  def phashNearDup(media: DataFrame, maxHamming: Int = 6,
                   bucketCap: Int = phashBucketCap): DataFrame = {
    // Materialize the fingerprint table once (16 bytes/doc): the band
    // self-join and both pair-side lookups would otherwise each re-derive
    // the payload scan. persist(), not localCheckpoint(): lazy (no Spark
    // job at DataFrame-construction time) and lineage-backed, so an
    // executor loss recomputes the lost blocks instead of failing the
    // query — localCheckpoint's non-replicated RDD blocks are a
    // fault-tolerance hole at scale. Keeping the fingerprint OUT of the
    // band join also keeps the hamming test out of the join condition —
    // as a fused residual it measured ~2.5× slower than the pure bucket
    // equi-join + post-join projection below.
    val fp = synchronized {
      lastFp.foreach(_.unpersist(false))
      val f = perceptualHash(media).persist()
      lastFp = Some(f)
      f
    }
    val bands = fp
      // _outer: the band array is always 4 elements over a non-null
      // fingerprint; a plain posexplode's inferred filter re-derives
      // the band transform per row below this projection (§6b round-15)
      .select(col("doc_id"), posexplode_outer(
        expr("transform(sequence(0, 3), j -> (shiftright(phash, 45 - 15*j) & 32767))")))
      .toDF("doc_id", "band_id", "band_key")
    // hub cap: drop DEGENERATE buckets before the self-join (see
    // [[phashBucketCap]]). The oversized-bucket table is tiny (hundreds
    // of rows at any measured scale — it lists BUCKETS, not members),
    // so the anti-join broadcasts; the self-join below then squares
    // only the informative buckets.
    val oversized = bands.groupBy(col("band_id"), col("band_key"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") > bucketCap)
      .select(col("band_id"), col("band_key"))
    val kept = bands.join(oversized, Seq("band_id", "band_key"), "left_anti")
    val cand = kept.as("a").join(kept.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Join-back strategy is LEFT TO AQE on purpose (round-4 verdict):
    // fp has one row per corpus document, so a forced broadcast — which
    // overrides autoBroadcastJoinThreshold — would ship ~16 GB+ to every
    // executor at 10^9 docs and OOM. Unhinted, AQE broadcasts while the
    // runtime size stays under threshold and falls back to a shuffle
    // join keyed on doc id beyond it (candidates and fingerprints
    // co-partition on that key; the 16-byte fingerprint rows are the
    // only thing shuffled — payloads never move). PlanSpec asserts no
    // hint survives here.
    cand
      .join(fp.select(col("doc_id").as("doc_a"), col("phash").as("ha")),
        Seq("doc_a"))
      .join(fp.select(col("doc_id").as("doc_b"), col("phash").as("hb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** G8: perceptual-hash near-dup CLUSTERS — the media twin of d8: the
    * g5 pair graph resolved into connected components with a canonical
    * keeper per cluster (the row a curation pass keeps; everything
    * else in the cluster is the drop list). Reuses
    * [[Dedup.clustersFromPairsOnly]] verbatim on the OUTPUT-sized pair
    * table — payloads never enter the loop, only doc-id labels — so
    * cluster resolution costs what the pair report costs. Completes
    * the media dedup lifecycle (fingerprint → banded pairs → clusters
    * → keeper), mirroring documents' d2→d7→d8.
    */
  def phashClusters(media: DataFrame, maxHamming: Int = 6): DataFrame =
    Dedup.clustersFromPairsOnly(
      phashNearDup(media, maxHamming).select(col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("is_canonical"))

  /** G9: quality-aware keeper per media near-dup cluster — d16's
    * argmax-keeper pattern applied to g8's clusters with g7's audit as
    * the quality signal: each cluster keeps its un-corrupt
    * (non-quarantined) copy with the highest declared resolution, ties
    * to the smaller doc_id — the production curation choice (g8's
    * min-id canonical keeps WHICHEVER copy has the smallest id,
    * corrupt or thumbnail included). Completes the media dedup story
    * to parity with text (d2→d7→d8→d16 ⇔ g5→g8→g9). The rank window
    * partitions by cluster_id (corpus-cardinality keys, cluster-sized
    * partitions — d16's plan shape); the quality columns ride one
    * doc_id join. All three sort keys are exact integers, so the
    * argmax is deterministic and engine-portable with no FP hazard.
    *
    * Split from [[phashQualityKeepers]] so a spec can inject a
    * CORRUPTED audit: on any corpus built through [[withPayload]] the
    * payload IS the encoded text, so quarantine is false for every
    * clustered doc (the ≥60-byte phash floor already excludes empty
    * payloads) and the intact key only bites on real corruption.
    */
  def qualityKeepersFrom(clusters: DataFrame, audit: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("intact").desc, col("resolution").desc, col("doc_id"))
    clusters
      .join(audit.select(col("doc_id"),
        when(col("quarantine"), 0).otherwise(1).as("intact"),
        (col("width").cast("long") * col("height")).as("resolution")),
        Seq("doc_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("intact"), col("resolution"),
        (row_number().over(w) === 1).as("is_keeper"))
  }

  def phashQualityKeepers(docs: DataFrame, maxHamming: Int = 6): DataFrame =
    qualityKeepersFrom(phashClusters(withPayload(docs), maxHamming),
      integrityAudit(docs))

  /** G6: perceptual-hash kNN — "find the k images most like this one"
    * by Hamming distance over the 60-bit aHash fingerprints (the query
    * surface of an image-similarity search, where G5 is the dedup
    * surface). One fingerprint scan (payloads never move — only the
    * 8-byte hash), the single query hash broadcast as a one-row cross
    * join, bit_count(xor) per row inside codegen, and a global top-k
    * that compiles to TakeOrderedAndProject. At 10⁹ images the scan is
    * the cost; the g5 banding composes in front as a candidate filter
    * when sub-scan latency is needed (the e2-vs-e1 trade in Hamming
    * space).
    */
  def phashKnn(media: DataFrame, queryDocId: Long, k: Int = 10): DataFrame = {
    val fp = perceptualHash(media).select(col("doc_id"), col("phash"))
    val q = fp.filter(col("doc_id") === queryDocId)
      .select(col("phash").as("q_phash"))
    fp.filter(col("doc_id") =!= queryDocId)
      .crossJoin(broadcast(q))
      .select(col("doc_id"),
        bit_count(col("phash").bitwiseXOR(col("q_phash"))).cast("long").as("hamming"))
      .orderBy(col("hamming").asc, col("doc_id"))
      .limit(k)
  }

  /** G7: payload-integrity audit — A10's dead-letter discipline applied
    * to binary media: every payload checked against its DECLARED
    * metadata (size, content digest, dimension bounds, format
    * whitelist) with per-rule flags and a `quarantine` verdict, so a
    * corrupt/truncated blob routes to a dead-letter sink instead of
    * poisoning the decode stage. All checks are row-local (digest +
    * integer compares at scan speed); the declared columns ride in on
    * the doc-id join, co-partitioned with the payload at the source.
    * On this synthetic corpus declared == actual everywhere (the
    * payload IS the encoded text), so violations are exercised by the
    * spec's crafted corruption, while the oracle pins the rule
    * arithmetic bit-for-bit.
    */
  def integrityAudit(docs: DataFrame): DataFrame = {
    val media = withPayload(docs)
    val decl = docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("declared_bytes"),
      md5(col("text")).as("declared_digest"))
    media.join(decl, Seq("doc_id"))
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        octet_length(col("payload")).cast("long").as("actual_bytes"),
        col("declared_bytes"),
        md5(col("payload")).as("actual_digest"), col("declared_digest"))
      .withColumn("r_nonempty", col("actual_bytes") > 0)
      .withColumn("r_size", col("actual_bytes") === col("declared_bytes"))
      .withColumn("r_digest", col("actual_digest") === col("declared_digest"))
      .withColumn("r_dims",
        col("width").between(64, 959) && col("height").between(64, 959))
      .withColumn("r_format", col("format").isin("fake/rgb8", "fake/gray8"))
      .withColumn("quarantine",
        !(col("r_nonempty") && col("r_size") && col("r_digest")
          && col("r_dims") && col("r_format")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G7: payload-vs-declared-metadata audit with quarantine verdict.
    "g7_payload_audit" -> ((s, d) =>
      integrityAudit(Tables.table(s, d, "documents"))),

    // G5: banded perceptual-hash near-dup over the payload bytes.
    "g5_phash_neardup" -> ((s, d) =>
      phashNearDup(withPayload(Tables.table(s, d, "documents")))),

    // G8: media near-dup clusters + keeper (d8's loop on g5's pairs).
    "g8_phash_clusters" -> ((s, d) =>
      phashClusters(withPayload(Tables.table(s, d, "documents")))),

    // G9: quality-aware keeper per media cluster (g8 × g7, d16's argmax).
    "g9_quality_keeper" -> ((s, d) =>
      phashQualityKeepers(Tables.table(s, d, "documents"))),

    // G6: Hamming kNN from doc 0's fingerprint (≥60-byte payload at
    // every SF, so the query row always exists).
    "g6_phash_knn" -> ((s, d) =>
      phashKnn(withPayload(Tables.table(s, d, "documents")), 0L)),

    // G10: frame-level shared-content dedup (g3 × d1 × c27's cap).
    "g10_shared_frames" -> ((s, d) =>
      sharedFrameDedup(withPayload(Tables.table(s, d, "documents")))),

    // G11: temporal shared-clip detection (g10's ordered refinement).
    "g11_shared_clips" -> ((s, d) =>
      sharedClips(withPayload(Tables.table(s, d, "documents")))),

    // G12: low-diversity (dead-air) frame screen + longest flat run.
    "g12_flat_frames" -> ((s, d) =>
      flatFrames(withPayload(Tables.table(s, d, "documents")))),

    // G4: batched inference plumbing (rows-only: stub encoder).
    "g4_embed_batched" -> ((s, d) =>
      embedBatched(withPayload(Tables.table(s, d, "documents"))).toDF()
        .select(col("doc_id"), size(col("embedding")).as("dims"),
          col("batch_size"))),
    // G1: payload + metadata schema and the batched decode plumbing,
    // end-to-end (rows-only: the stub features have no SQL twin).
    "g1_multimodal_meta" -> ((s, d) =>
      decodeFeatures(withPayload(Tables.table(s, d, "documents"))).toDF()),

    // G2: resize plumbing (stub codec) — dims + payload shrink.
    "g2_resize" -> ((s, d) =>
      resize(withPayload(Tables.table(s, d, "documents")))
        .select(col("doc_id"), col("width"), col("height"),
          length(col("payload")).cast("long").as("n_bytes"))),

    // G3: frame sampling — exploded frame rows with bounded slices.
    "g3_frame_sample" -> ((s, d) =>
      frameSample(withPayload(Tables.table(s, d, "documents")))
        .select("doc_id", "frame_idx", "frame_bytes"))
  )

  /** DuckDB twins for the stub-free plumbing outputs: g2/g3 emit only
    * size/index arithmetic over the UTF-8 byte length (strlen in DuckDB
    * = octet_length in Spark), so the resize contract and the frame
    * index/slice math get exact oracle checks. g1/g4 stay rows-only —
    * their feature values come from the stub codec, which has no SQL
    * analogue by construction.
    */
  /** The g5/g6-shared fingerprint derivation: same codes (single-byte
    * corpus: ascii = byte), same integer mean-threshold bits, same
    * acc*2+b fold.
    */
  /** The g5/g8-shared verified pair derivation (`pv`: banded
    * candidates + hamming verify ≤ 6) — the banding formula and the
    * cap live HERE once; g5 selects the pairs, g8 closes them into
    * components.
    */
  private val phashPairSql: String =
    s"""
      |bands AS MATERIALIZED (
      |  SELECT doc_id, (phash >> (45 - 15 * j.j)) & 32767 AS band_key, j.j AS band_id
      |  FROM fp, (SELECT unnest([0, 1, 2, 3]) AS j) j),
      |oversized AS (
      |  SELECT band_id, band_key FROM bands
      |  GROUP BY 1, 2 HAVING count(*) > $phashBucketCap),
      |kept AS (
      |  SELECT b.doc_id, b.band_key, b.band_id
      |  FROM bands b ANTI JOIN oversized o
      |    ON b.band_id = o.band_id AND b.band_key = o.band_key),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM kept a JOIN kept b
      |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |pv AS (
      |  SELECT c.doc_a, c.doc_b,
      |         CAST(bit_count(xor(fa.phash, fb.phash)) AS BIGINT) AS hamming
      |  FROM cand c JOIN fp fa ON c.doc_a = fa.doc_id JOIN fp fb ON c.doc_b = fb.doc_id
      |  WHERE bit_count(xor(fa.phash, fb.phash)) <= 6)""".stripMargin

  private val phashCteSql: String =
    """WITH ch AS (
      |  SELECT doc_id, list_transform(str_split(substr(text, 1, 60), ''), c -> ascii(c)) AS codes
      |  FROM documents WHERE length(text) >= 60),
      |m AS (
      |  SELECT doc_id, codes,
      |         CAST(list_reduce(list_prepend(0, codes), (x, y) -> x + y) AS DOUBLE)
      |           / len(codes) AS mu
      |  FROM ch),
      |fp AS (
      |  SELECT doc_id,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(range(1, len(codes) + 1),
      |             i -> CASE WHEN CAST(codes[i] AS DOUBLE) >= mu
      |                       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |           (acc, b) -> acc * 2 + b) AS phash
      |  FROM m)""".stripMargin

  /** The g7 audit twin: the payload is the encoded text, so every
    * declared/actual pair recomputes from `text` (md5(string) digests
    * the UTF-8 bytes on both engines); width/height use g1's spelling.
    * Shared by the g7 entry and g9's quality CTE (the d16 composition
    * rule — the checked audit semantics live in exactly one string).
    */
  private val g7AuditSql: String =
    """WITH p AS (
      |  SELECT doc_id, 'fake/rgb8' AS format,
      |         CAST((doc_id*131 + strlen(text)*7) % 896 + 64 AS INT) AS width,
      |         CAST((doc_id*239 + strlen(text)*11) % 896 + 64 AS INT) AS height,
      |         CAST(strlen(text) AS BIGINT) AS actual_bytes,
      |         CAST(strlen(text) AS BIGINT) AS declared_bytes,
      |         md5(text) AS actual_digest,
      |         md5(text) AS declared_digest
      |  FROM documents)
      |SELECT doc_id, format, width, height, actual_bytes, declared_bytes,
      |       actual_digest, declared_digest,
      |       actual_bytes > 0 AS r_nonempty,
      |       actual_bytes = declared_bytes AS r_size,
      |       actual_digest = declared_digest AS r_digest,
      |       (width BETWEEN 64 AND 959 AND height BETWEEN 64 AND 959) AS r_dims,
      |       format IN ('fake/rgb8', 'fake/gray8') AS r_format,
      |       NOT (actual_bytes > 0 AND actual_bytes = declared_bytes
      |            AND actual_digest = declared_digest
      |            AND width BETWEEN 64 AND 959 AND height BETWEEN 64 AND 959
      |            AND format IN ('fake/rgb8', 'fake/gray8')) AS quarantine
      |FROM p""".stripMargin

  /** The g8/g9-shared cluster derivation: fingerprints → banded+verified
    * pairs (phashPairSql) → hook+jump component close (the unrolled
    * oracle twin of the engine's own pointer jumping —
    * Dedup.jumpCloseSql; round 14 replaced the all-walks recursive CTE
    * that could not terminate on sf1's giant component) → per-cluster
    * sizes. One string, so the cluster semantics g9's keeper ranks
    * over are EXACTLY the ones g8 reports.
    */
  private lazy val phashClusterPrefix: String =
    phashCteSql + "," + phashPairSql +
      """,
        |e AS MATERIALIZED (
        |  SELECT doc_a AS u, doc_b AS v FROM pv
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pv),
        |""".stripMargin +
      Dedup.jumpCloseSql("e", "clusters", "doc_id", "cluster_id") +
      """,
        |sized AS (
        |  SELECT doc_id, cluster_id,
        |         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |  FROM clusters)""".stripMargin

  def oracles: Map[String, String] = Map(
    "g7_payload_audit" -> g7AuditSql,

    // G6: the same fingerprint CTE, one query row, bit_count(xor) rank.
    "g6_phash_knn" -> (phashCteSql +
      """,
        |q AS (SELECT phash AS qh FROM fp WHERE doc_id = 0)
        |SELECT f.doc_id, CAST(bit_count(xor(f.phash, q.qh)) AS BIGINT) AS hamming
        |FROM fp f, q WHERE f.doc_id <> 0
        |ORDER BY hamming, f.doc_id LIMIT 10""".stripMargin),

    // G5: the banding itself is reproduced over the shared fingerprint
    // CTE, so the BANDED result is exact.
    "g5_phash_neardup" -> (phashCteSql + "," + phashPairSql +
      """
        |SELECT doc_a, doc_b, hamming FROM pv""".stripMargin),

    // G8: g5's pair derivation (the SHARED phashPairSql — banding and
    // hamming cap live in one place) + the recursive reachability
    // close (the c28 oracle recipe applied to media pairs).
    "g8_phash_clusters" -> (phashClusterPrefix +
      """
        |SELECT doc_id, cluster_id, cluster_size,
        |       doc_id = cluster_id AS is_canonical
        |FROM sized""".stripMargin),

    // G9: the SHARED cluster CTEs (g8's reachability close) joined to
    // the SHARED g7 audit as the quality signal, closed with the
    // per-cluster (intact DESC, resolution DESC, doc_id) argmax — the
    // d16/b41/f16 first-of-order recipe, portable because every sort
    // key is an exact integer.
    "g9_quality_keeper" -> (phashClusterPrefix +
      s""",
        |q AS (
        |  SELECT doc_id,
        |         CASE WHEN quarantine THEN 0 ELSE 1 END AS intact,
        |         CAST(width * height AS BIGINT) AS resolution
        |  FROM (
        |$g7AuditSql) a)
        |SELECT s.doc_id, s.cluster_id, s.cluster_size, q.intact, q.resolution,
        |       row_number() OVER (PARTITION BY s.cluster_id
        |                          ORDER BY q.intact DESC, q.resolution DESC, s.doc_id) = 1
        |         AS is_keeper
        |FROM sized s JOIN q ON s.doc_id = q.doc_id""".stripMargin),

    // g1's stub features are byte statistics; on this corpus (verified
    // single-byte at every SF) ascii(char) = byte value and both engines
    // fold left-to-right, so even the double mean matches exactly.
    "g1_multimodal_meta" ->
      """SELECT doc_id, 'fake/rgb8' AS format,
        |       CAST((doc_id*131 + strlen(text)*7) % 896 + 64 AS INT) AS width,
        |       CAST((doc_id*239 + strlen(text)*11) % 896 + 64 AS INT) AS height,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       CASE WHEN strlen(text) = 0 THEN CAST(0.0 AS DOUBLE)
        |            ELSE list_avg(list_transform(str_split(text, ''), c -> CAST(ascii(c) AS DOUBLE))) END AS feat_mean,
        |       CASE WHEN strlen(text) = 0 THEN CAST(0.0 AS DOUBLE)
        |            ELSE CAST(ascii(substr(text, 1, 1)) AS DOUBLE) END AS feat_first
        |FROM documents""".stripMargin,
    "g2_resize" ->
      """SELECT doc_id,
        |       CAST(((doc_id*131 + strlen(text)*7) % 896 + 64) // 2 AS INT) AS width,
        |       CAST(((doc_id*239 + strlen(text)*11) % 896 + 64) // 2 AS INT) AS height,
        |       CAST(CEIL(strlen(text) / 4.0) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    "g3_frame_sample" ->
      """SELECT doc_id,
        |       CAST(frame_idx AS INT) AS frame_idx,
        |       CAST(LEAST(64, nb - frame_idx*64) AS BIGINT) AS frame_bytes
        |FROM (SELECT doc_id, strlen(text) AS nb,
        |             unnest(range(0, CAST(CEIL(strlen(text) / 64.0) AS INT), 4)) AS frame_idx
        |      FROM documents)""".stripMargin,

    // G10: frames are aligned 64-byte substrings of the payload (= the
    // text on this single-byte corpus), so the oracle groups the RAW
    // frame strings where the engine groups their md5 digests —
    // identical partitions barring an md5 collision; the hub cap and
    // the ≥2 shared threshold are part of the checked semantics.
    // G12: the oracle counts distinct CHARS of the aligned 64-byte text
    // frame where the engine counts distinct BYTES via hex pairs —
    // byte ≡ char on the single-byte corpus (g10/g11's equivalence).
    // Counts are longs; the flat-run islands mirror b44; the division
    // is guarded at zero full frames on both sides.
    "g12_flat_frames" ->
      """WITH fr AS (
        |  SELECT doc_id,
        |         unnest(range(0, CAST(CEIL(strlen(text) / 64.0) AS INT))) AS frame_idx,
        |         text
        |  FROM documents WHERE strlen(text) > 0),
        |f2 AS (
        |  SELECT doc_id, frame_idx, substr(text, frame_idx*64 + 1, 64) AS frame
        |  FROM fr),
        |div AS (
        |  SELECT doc_id, frame_idx,
        |         strlen(frame) = 64 AS is_full,
        |         strlen(frame) = 64
        |           AND len(list_distinct(str_split(frame, ''))) <= 15 AS is_flat
        |  FROM f2),
        |counts AS (
        |  SELECT doc_id,
        |         count(CASE WHEN is_full THEN 1 END) AS n_frames,
        |         count(CASE WHEN is_flat THEN 1 END) AS n_flat
        |  FROM div GROUP BY 1),
        |fl AS (
        |  SELECT doc_id, frame_idx,
        |         frame_idx - row_number() OVER (PARTITION BY doc_id
        |                                        ORDER BY frame_idx) AS grp
        |  FROM div WHERE is_flat),
        |runs AS (
        |  SELECT doc_id, max(cnt) AS max_flat_run FROM (
        |    SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS cnt
        |    FROM fl GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT c.doc_id, c.n_frames, c.n_flat,
        |       CASE WHEN c.n_frames = 0 THEN CAST(0.0 AS DOUBLE)
        |            ELSE CAST(c.n_flat AS DOUBLE) / c.n_frames END AS flat_frac,
        |       coalesce(r.max_flat_run, 0) AS max_flat_run
        |FROM counts c LEFT JOIN runs r USING (doc_id)""".stripMargin,

    "g10_shared_frames" ->
      """WITH fr AS (
        |  SELECT DISTINCT doc_id, substr(text, frame_idx*64 + 1, 64) AS f
        |  FROM (SELECT doc_id, text,
        |               unnest(range(0, CAST(CEIL(strlen(text) / 64.0) AS INT))) AS frame_idx
        |        FROM documents)),
        |cnt AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames FROM fr GROUP BY doc_id),
        |cell AS (
        |  SELECT f, count(*) AS n FROM fr GROUP BY f),
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM fr a
        |  JOIN fr b ON a.f = b.f AND a.doc_id < b.doc_id
        |  JOIN cell c ON a.f = c.f
        |  WHERE c.n <= 64),
        |sp AS (
        |  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS shared_frames
        |  FROM pr GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT s.doc_a, s.doc_b, s.shared_frames,
        |       ca.n_frames AS frames_a, cb.n_frames AS frames_b,
        |       CAST(s.shared_frames AS DOUBLE) / CAST(ca.n_frames AS DOUBLE) AS containment_a,
        |       CAST(s.shared_frames AS DOUBLE) / CAST(cb.n_frames AS DOUBLE) AS containment_b
        |FROM sp s
        |JOIN cnt ca ON s.doc_a = ca.doc_id
        |JOIN cnt cb ON s.doc_b = cb.doc_id""".stripMargin,

    // G11: the oracle shingles RAW frame strings where the engine
    // shingles md5 digests (g10's digest↔string equivalence — aligned
    // 64-byte substrings of the single-byte text corpus), then the
    // same diagonal gaps-and-islands and the same integer-key argmax.
    // Occurrence cap and minRun are part of the checked semantics.
    "g11_shared_clips" ->
      """WITH fr AS (
        |  SELECT doc_id, frame_idx AS pos, substr(text, frame_idx*64 + 1, 64) AS f
        |  FROM (SELECT doc_id, text,
        |               unnest(range(0, CAST(CEIL(strlen(text) / 64.0) AS INT))) AS frame_idx
        |        FROM documents)),
        |sh AS (
        |  SELECT a.doc_id, a.pos, a.f || '|' || b.f || '|' || c.f AS s
        |  FROM fr a
        |  JOIN fr b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN fr c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
        |cell AS (SELECT s, count(*) AS n FROM sh GROUP BY s),
        |m AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.pos AS pos_a, b.pos AS pos_b, b.pos - a.pos AS off
        |  FROM sh a
        |  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  JOIN cell c ON a.s = c.s
        |  WHERE c.n <= 64),
        |runs AS (
        |  SELECT doc_a, doc_b, off,
        |         CAST(count(*) AS BIGINT) AS run_shingles,
        |         min(pos_a) AS start_a
        |  FROM (SELECT m.*,
        |               pos_a - row_number() OVER (
        |                 PARTITION BY doc_a, doc_b, off ORDER BY pos_a) AS grp
        |        FROM m)
        |  GROUP BY doc_a, doc_b, off, grp),
        |nm AS (
        |  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_matches
        |  FROM m GROUP BY 1, 2),
        |best AS (
        |  SELECT doc_a, doc_b, off, run_shingles, start_a,
        |         row_number() OVER (PARTITION BY doc_a, doc_b
        |                            ORDER BY run_shingles DESC, off, start_a) AS rn
        |  FROM runs)
        |SELECT b.doc_a, b.doc_b, n.n_matches,
        |       CAST(b.off AS BIGINT) AS best_offset, b.run_shingles,
        |       b.run_shingles + 2 AS clip_frames
        |FROM best b JOIN nm n USING (doc_a, doc_b)
        |WHERE b.rn = 1 AND b.run_shingles >= 2""".stripMargin)
}
