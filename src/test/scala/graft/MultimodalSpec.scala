package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal payload plumbing (SURVEY §2 G1): binary lifecycle, typed
  * metadata, batched partition-local decode (stubbed codec).
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("G1 payload schema: binary column + typed metadata") {
    import spark.implicits._
    val docs = Seq((1L, "hello"), (2L, "worlds!")).toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs)
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") === "binary")
    assert(schema("width") === "integer" && schema("height") === "integer")
    val r = media.filter($"doc_id" === 1L).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "hello")
    val w = r.getAs[Int]("width")
    assert(w >= 64 && w < 1024)
  }

  test("G5 perceptual hash: identical payloads collide, near-identical stay hamming-close") {
    import spark.implicits._
    val base = ('a' to 'z').mkString + ('A' to 'Z').mkString + "01234567" // 60 chars
    val nearby = base.updated(10, 'K').updated(40, '0') // two byte-level edits
    val far = base.reverse.updated(5, '~')
    val docs = Seq(1L -> base, 2L -> base, 3L -> nearby, 4L -> far).toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs)
    val fp = Multimodal.perceptualHash(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    assert(fp(1L) === fp(2L), "identical payloads must fingerprint identically")
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) <= 6,
      "two byte edits must flip at most a few threshold bits")
    val pairs = Multimodal.phashNearDup(media).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("hamming"))
      .toMap
    assert(pairs.get((1L, 2L)).contains(0L))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 4L)), s"far payload must not pair: $pairs")
  }

  test("G8 phash clusters: pair endpoints share a cluster, one min-id canonical each, far payload excluded") {
    import spark.implicits._
    val base = ('a' to 'z').mkString + ('A' to 'Z').mkString + "01234567" // 60 chars
    val nearby = base.updated(10, 'K').updated(40, '0')
    val far = base.reverse.updated(5, '~')
    // 1≡2 exactly, 3 near both → one {1,2,3} cluster; 4 never pairs
    val docs = Seq(1L -> base, 2L -> base, 3L -> nearby, 4L -> far).toDF("doc_id", "text")
    val out = Multimodal.phashClusters(Multimodal.withPayload(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Boolean]("is_canonical")))).toMap
    assert(out === Map(
      1L -> ((1L, 3L, true)), 2L -> ((1L, 3L, false)), 3L -> ((1L, 3L, false))),
      s"expected one {1,2,3} cluster with doc 1 canonical, got $out")
    // corpus invariants: exactly one canonical (= the min member) per
    // cluster, and every cluster has >= 2 members (singletons have no
    // pair and never enter the report)
    val corpus = graft.operators.Multimodal.queries("g8_phash_clusters")(spark, SF)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_canonical")))
    assert(corpus.nonEmpty)
    corpus.groupBy(_._2).foreach { case (cid, g) =>
      assert(g.count(_._4) === 1, s"cluster $cid canonical count != 1")
      assert(g.map(_._1).min === cid, s"cluster $cid id is not the min member")
      assert(g.head._3 === g.length.toLong && g.length >= 2)
    }
  }

  test("G6 Hamming kNN: identical payload ranks first at distance 0, far payload last") {
    import spark.implicits._
    val base = ('a' to 'z').mkString + ('A' to 'Z').mkString + "01234567" // 60 chars
    val nearby = base.updated(10, 'K').updated(40, '0')
    val far = base.reverse.updated(5, '~')
    val docs = Seq(0L -> base, 1L -> base, 2L -> nearby, 3L -> far).toDF("doc_id", "text")
    val knn = Multimodal.phashKnn(Multimodal.withPayload(docs), 0L, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("hamming"))
    assert(knn.head === (1L -> 0L), s"identical payload must rank first: ${knn.toSeq}")
    assert(knn.map(_._1).toSeq === Seq(1L, 2L, 3L), s"rank order wrong: ${knn.toSeq}")
    // distances non-decreasing and consistent with local bitCount
    assert(knn.map(_._2).toSeq === knn.map(_._2).toSeq.sorted)
  }

  test("G5 banded candidates are a subset of all-pairs with measured recall on the corpus") {
    val docs = graft.sources.Tables.table(spark, SF, "documents")
    val media = Multimodal.withPayload(docs)
    val banded = Multimodal.phashNearDup(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fp = Multimodal.perceptualHash(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash"))
    val exact = (for {
      (ida, ha) <- fp; (idb, hb) <- fp
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (ida, idb)).toSet
    assert(banded.subsetOf(exact), s"banding invented pairs: ${banded.diff(exact)}")
    assert(exact.nonEmpty && banded.size >= exact.size / 2,
      s"recall collapsed: ${banded.size}/${exact.size}")
  }

  test("G2 resize halves dims and shrinks the payload") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 400)).toDF("doc_id", "text")
    val r = Multimodal.resize(Multimodal.withPayload(docs)).collect()(0)
    val orig = Multimodal.withPayload(docs).collect()(0)
    assert(r.getAs[Int]("width") === orig.getAs[Int]("width") / 2)
    assert(r.getAs[Array[Byte]]("payload").length === 100) // 400 / 2²
  }

  test("G3 frame sampling emits every 4th fixed-size frame") {
    import spark.implicits._
    val docs = Seq((1L, "y" * 520)).toDF("doc_id", "text") // 9 frames of 64B
    val frames = Multimodal.frameSample(Multimodal.withPayload(docs)).collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.toSeq === Seq(0, 4, 8))
    val byIdx = frames.map(f => f.getAs[Int]("frame_idx") -> f.getAs[Long]("frame_bytes")).toMap
    assert(byIdx(0) === 64L && byIdx(4) === 64L)
    assert(byIdx(8) === 8L) // 520 - 8*64 = tail frame
  }

  test("G1 batched decode preserves rows, is deterministic, drops payloads") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"document number $i")).toDF("doc_id", "text")
    val feats = Multimodal.decodeFeatures(Multimodal.withPayload(docs), batchSize = 16)
    assert(feats.count() === 200)
    assert(!feats.columns.contains("payload"), "feature rows must not carry payload bytes")
    val a = feats.filter(_.doc_id == 7L).collect()(0)
    val b = Multimodal.decodeFeatures(Multimodal.withPayload(docs)).filter(_.doc_id == 7L).collect()(0)
    assert(a === b)
    assert(a.n_bytes === "document number 7".getBytes("UTF-8").length.toLong)
  }

  test("G4 batched inference fills batches and encodes deterministically") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"document number $i")).toDF("doc_id", "text")
    val media = Multimodal.withPayload(docs).repartition(2)
    val out = Multimodal.embedBatched(media, batchSize = 32).collect()
    assert(out.length === 200)
    // every batch is full except possibly one trailing partial per partition
    val sizes = out.map(_.batch_size)
    assert(sizes.count(_ === 32) >= 200 - 2 * 31, sizes.groupBy(identity).view.mapValues(_.length).toMap.toString)
    assert(out.forall(_.embedding.length === 4))
    // determinism: same doc -> same vector across runs
    val again = Multimodal.embedBatched(media, batchSize = 32).collect()
      .map(v => v.doc_id -> v.embedding).toMap
    assert(out.forall(v => again(v.doc_id) === v.embedding))
  }

  test("G7 integrity audit: intact payloads pass every rule; an empty payload quarantines") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a healthy document body"),
      (2L, "another fine payload"),
      (3L, "")) // empty → zero bytes → dead-letter
      .toDF("doc_id", "text")
    val out = Multimodal.integrityAudit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = out(id)
      Seq("r_nonempty", "r_size", "r_digest", "r_dims", "r_format")
        .foreach(f => assert(r.getAs[Boolean](f), s"doc $id failed $f"))
      assert(!r.getAs[Boolean]("quarantine"))
      assert(r.getAs[String]("actual_digest") === r.getAs[String]("declared_digest"))
    }
    assert(!out(3L).getAs[Boolean]("r_nonempty"))
    assert(out(3L).getAs[Boolean]("quarantine"), "an empty payload must dead-letter")
    // the real corpus is intact end to end
    val real = Multimodal.integrityAudit(
      graft.sources.Tables.table(spark, SF, "documents"))
    assert(real.filter(col("quarantine")).count() === 0L)
  }

  test("G10 shared frames: a clip inside a longer video scores containment 1.0; in-video repeats count once") {
    import spark.implicits._
    // 64-char aligned blocks so frame boundaries are exact
    val X = "x" * 64; val Y = "y" * 64; val Z = "z" * 64; val W = "w" * 64
    val docs = Seq(
      (1L, X + Y),          // the clip: frames {X, Y}
      (2L, X + Y + Z),      // the full video: frames {X, Y, Z}
      (3L, W + W + W),      // unrelated, self-repeating
      (4L, X + X)           // repeats a shared frame WITHIN itself
    ).toDF("doc_id", "text")
    val out = Multimodal.sharedFrameDedup(Multimodal.withPayload(docs)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("shared_frames"), r.getAs[Double]("containment_a"),
          r.getAs[Double]("containment_b")))).toMap
    // only (1,2) shares >= 2 distinct frames; doc 4 shares just {X}
    // with 1 and 2 (in-video repetition buys no extra shared frames),
    // doc 3 shares nothing
    assert(out.keySet === Set((1L, 2L)), s"got ${out.keySet}")
    assert(out((1L, 2L)) === ((2L, 1.0, 2.0 / 3.0)),
      "the clip is fully contained; the long side dilutes to 2/3")
  }

  test("G11 shared clips: contiguous aligned runs detected; scattered shared frames are not a clip") {
    import spark.implicits._
    def blk(c: Char) = c.toString * 64
    val (a, b, c, d, e) = (blk('a'), blk('b'), blk('c'), blk('d'), blk('e'))
    val docs = Seq(
      // doc 1: frames a b c d e; doc 2 lifts the 4-frame run b c d e
      // at its position 1 (offset 0 on the diagonal)
      (1L, a + b + c + d + e),
      (2L, blk('x') + b + c + d + e + blk('z')),
      // doc 3 has the SAME frames b,c,d,e but reshuffled — shares the
      // frame SET with 1 and 2 (g10 would pair them) yet no 3-frame
      // ORDER, so no shingle matches and no clip
      (3L, d + b + e + c)
    ).toDF("doc_id", "text")
    val out = Multimodal.sharedClips(Multimodal.withPayload(docs)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("n_matches"), r.getAs[Long]("best_offset"),
          r.getAs[Long]("run_shingles"), r.getAs[Long]("clip_frames")))).toMap
    assert(out.keySet === Set((1L, 2L)),
      s"only the order-preserving pair is a clip (got ${out.keySet})")
    // shingles (b,c,d) and (c,d,e): doc1 pos 1,2 ↔ doc2 pos 1,2 —
    // run of 2 shingles on diagonal 0 ⇒ a 4-frame clip
    assert(out((1L, 2L)) === ((2L, 0L, 2L, 4L)))
    // sanity: g10 DOES pair the reshuffled copy — the two operators
    // answer different questions
    val setPairs = Multimodal.sharedFrameDedup(Multimodal.withPayload(docs))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(setPairs.contains((1L, 3L)),
      "the reshuffled copy shares the frame set; only the ORDER is gone")
  }

  test("G9 quality keeper: corrupt copies never keep, resolution breaks intact ties, doc_id last") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // hand-built clusters + audit (the qualityKeepersFrom split exists
    // exactly so corruption can be injected: a withPayload corpus is
    // never quarantined, so the intact key would otherwise be untestable)
    val clusters = Seq(
      // cluster 10: 11 is the highest-resolution copy but CORRUPT —
      // intact must dominate resolution; 12 beats 10 on resolution
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L),
      // cluster 20: both intact, equal resolution — doc_id tiebreak
      (20L, 20L, 2L), (21L, 20L, 2L))
      .toDF("doc_id", "cluster_id", "cluster_size")
    val audit = Seq(
      (10L, false, 10, 10), (11L, true, 100, 100), (12L, false, 20, 20),
      (20L, false, 30, 30), (21L, false, 30, 30))
      .toDF("doc_id", "quarantine", "width", "height")
    val keepers = Multimodal.qualityKeepersFrom(clusters, audit).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("is_keeper"), r.getAs[Int]("intact"),
          r.getAs[Long]("resolution"))).toMap
    assert(keepers(12L)._1, "cluster 10 must keep the intact high-res copy")
    assert(!keepers(11L)._1, "the corrupt copy must never keep, whatever its resolution")
    assert(!keepers(10L)._1)
    assert(keepers(11L)._2 === 0 && keepers(10L)._2 === 1)
    assert(keepers(20L)._1 && !keepers(21L)._1, "exact ties fall to the smaller doc_id")
    // end-to-end on the real corpus: exactly one keeper per cluster,
    // and every keeper is its cluster's (intact, resolution, -doc_id)
    // argmax over the collected report
    val real = Multimodal.phashQualityKeepers(
      graft.sources.Tables.table(spark, SF, "documents")).collect()
    val byCluster = real.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (cid, rows) =>
      val kept = rows.filter(_.getAs[Boolean]("is_keeper"))
      assert(kept.length === 1, s"cluster $cid must keep exactly one copy")
      val best = rows.minBy(r => (-r.getAs[Int]("intact"),
        -r.getAs[Long]("resolution"), r.getAs[Long]("doc_id")))
      assert(kept.head.getAs[Long]("doc_id") === best.getAs[Long]("doc_id"),
        s"cluster $cid keeper is not the quality argmax")
      assert(rows.length.toLong === rows.head.getAs[Long]("cluster_size"))
    }
  }

  test("G12 flat frames: diversity flags full frames only; runs count consecutive flats") {
    import spark.implicits._
    val flat = "a" * 64                              // 1 distinct byte  → flat
    val busy = ("abcdefghijklmnopqrstuvwxyz" * 3).take(64) // 26 distinct → not flat
    val docs = Seq(
      1L -> (flat + flat + busy + flat),  // flats at 0,1,3 → run 2, frac 3/4
      2L -> (busy + busy),                // no flat frames
      3L -> (flat + "bb"),                // 1 flat + a 2-byte tail (excluded)
      4L -> "cc")                         // tail only → 0 full frames
      .toDF("doc_id", "text")
    val out = Multimodal.flatFrames(Multimodal.withPayload(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("n_flat"),
          r.getAs[Double]("flat_frac"), r.getAs[Long]("max_flat_run")))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L) === ((4L, 3L, 0.75, 2L)),
      "scattered flat at idx 3 must not extend the 0-1 run")
    assert(out(2L) === ((2L, 0L, 0.0, 0L)))
    assert(out(3L) === ((1L, 1L, 1.0, 1L)), "the tail fragment is excluded both ways")
    assert(out(4L) === ((0L, 0L, 0.0, 0L)), "tail-only docs report zeros, not NaN")
  }

  test("G12 threshold boundary: exactly maxDistinct distinct bytes still flags") {
    import spark.implicits._
    // 15 distinct chars (= default maxDistinct) then 16 distinct
    val d15 = ("abcdefghijklmno" * 5).take(64)
    val d16 = ("abcdefghijklmnop" * 4).take(64)
    val docs = Seq(1L -> d15, 2L -> d16).toDF("doc_id", "text")
    val out = Multimodal.flatFrames(Multimodal.withPayload(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_flat")).toMap
    assert(out(1L) === 1L, "<= is inclusive at the threshold")
    assert(out(2L) === 0L)
  }
}
