package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.{Bm25, VectorIndex}

/** THE crash-injection sweep (round-10 verdict #5): every store
  * mutation routed through [[CommitProtocol]] is killed between every
  * pair of its steps, and each store's documented crash contract is
  * asserted in every window:
  *
  *  - reader-safe stores (agg fold, sample layout, gram index, the
  *    two ingest paths): the canonical read in any crash window is a
  *    complete consistent answer — the committed state, or (for
  *    marker-committed appends) the batch-invisible state; never a
  *    partial view, never an exception.
  *  - maintenance folds (BM25 postings, IVF cell deltas — documented
  *    "no reader/replay in flight"): any window where the read could
  *    be inexact still has its delta dirs on disk — the operator's
  *    check-before-retry signal — and the prescribed remediation
  *    (rebuild from source) restores the exact answer.
  *
  * Step boundaries are enumerated from [[CommitProtocol.stepsOf]]
  * after one clean run, so a store that grows a step is automatically
  * swept at the new boundary without touching this spec.
  */
class CommitCrashSpec extends SparkSpec {
  import spark.implicits._

  /** One store under the sweep. `observe` is the store's canonical
    * STABLE answer — a pure function of the logical content, invariant
    * under compaction, replay, and rebuild-from-source, so the same
    * expected value gates every window and the healed end state. */
  private trait CrashCase {
    def name: String
    def op: String
    def setup(dir: String): Unit
    def mutate(dir: String): Unit
    def observe(dir: String): Seq[String]
    /** Acceptable crash-window read (default: the committed answer —
      * answer-neutral ops). */
    def acceptable(dir: String, after: Seq[String],
        got: Seq[String]): Boolean = got == after
    /** Bring the crashed store back to the committed answer (default:
      * replay the mutation — the idempotent-op contract). */
    def heal(dir: String): Unit = mutate(dir)
  }

  private def docs = Tables.documents(spark, sf0001)
  private def emb = Tables.embeddings(spark, sf0001)

  // ---- 1. the agg append-store fold (StoreCompaction MVCC-with-grace)

  private object AggFold extends CrashCase {
    val name = "agg store fold"
    val op = "store-fold"
    private def store(dir: String) =
      new graft.agg.SummingStore(dir, Seq("day", "level"), Seq("total"))
    def setup(dir: String): Unit = {
      val s = store(dir)
      def p(rows: (String, String, Long)*) =
        rows.toDF("day", "level", "total")
          .withColumn("day", col("day").cast("date"))
      s.append(p(("2026-01-01", "info", 2L),
        ("2026-01-01", "error", 1L)), batchId = 0)
      s.append(p(("2026-01-01", "info", 3L),
        ("2026-01-02", "info", 5L)), batchId = 1)
    }
    def mutate(dir: String): Unit = store(dir).compact(spark)
    def observe(dir: String): Seq[String] =
      store(dir).read(spark).orderBy("day", "level").collect()
        .map(r => s"${r.getDate(0)} ${r.getString(1)} ${r.getLong(2)}")
        .toSeq
  }

  // ---- 2. SampleLayout compact (manifest-with-grace)

  private object SampleCompact extends CrashCase {
    val name = "sample layout compact"
    val op = "sample-compact"
    private def events = Tables.events(spark, sf0001)
    def setup(dir: String): Unit = {
      SampleLayout.write(events, dir, col("user_id"), Seq("ts"),
        files = 4)
      val batch = events.limit(40)
        .withColumn("event_id", col("event_id") + lit(90000000L))
      SampleLayout.append(batch, dir, batchId = 1, col("user_id"),
        Seq("ts"))
    }
    def mutate(dir: String): Unit =
      SampleLayout.compact(spark, dir, files = 4, sortCols = Seq("ts"))
    def observe(dir: String): Seq[String] =
      SampleLayout.sampleScan(spark, dir, 1, 4)
        .select("event_id").collect().map(_.getLong(0))
        .sorted.map(_.toString).toSeq
  }

  // ---- 3. gram-bloom skip index: REPLAY of a committed append (the
  //         retract-first protocol's reason to exist)

  private object GramReplay extends CrashCase {
    val name = "gram index append replay"
    val op = "gramidx-append"
    private val planted = Seq(
      (910001L, "freshzz token planted alpha", "en", "srcA", 31L),
      (910002L, "freshzz second planted beta", "en", "srcA", 29L))
    private def plantedDf =
      planted.toDF("doc_id", "text", "lang", "source", "n_chars")
    def setup(dir: String): Unit = {
      TextSkipIndex.write(docs.limit(60), dir, files = 4)
      // the batch is COMMITTED once; the mutation under sweep is its
      // replay — the window where data-first ordering broke
      TextSkipIndex.append(plantedDf, dir, batchId = 7)
    }
    def mutate(dir: String): Unit =
      TextSkipIndex.append(plantedDf, dir, batchId = 7)
    def observe(dir: String): Seq[String] =
      TextSkipIndex.searchToken(spark, dir, "freshzz")
        .select("doc_id").collect().map(_.getLong(0))
        .sorted.map(_.toString).toSeq
    override def acceptable(dir: String, after: Seq[String],
        got: Seq[String]): Boolean =
      // invisible-not-dangling: a crash window may hide the batch
      // (sidecar retracted) but must never throw or return part of it
      got == after || got.isEmpty
  }

  // ---- 4. BM25 ingest (stats dir = the batch's commit marker)

  private object Bm25Ingest extends CrashCase {
    val name = "bm25 delta ingest"
    val op = "bm25-ingest"
    private def base = docs.filter(col("doc_id") < 400)
    private def arrivals =
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 430)
    private val terms = Seq("window", "merge", "dup")
    def setup(dir: String): Unit = { Bm25.ensurePostings(base, dir); () }
    def mutate(dir: String): Unit =
      Bm25.appendPostings(arrivals, dir, batchId = 0L)
    def observe(dir: String): Seq[String] =
      Bm25.scoreTopKIndexed(spark, dir, terms, 15).collect()
        .map(r => s"${r.getLong(0)} ${r.getDouble(1)} ${r.getLong(2)}")
        .toSeq
    private lazy val baseOnly = {
      val d = tmpDir("crash-bm25-baseonly")
      Bm25.ensurePostings(base, d)
      observe(d)
    }
    override def acceptable(dir: String, after: Seq[String],
        got: Seq[String]): Boolean =
      // uncommitted batch is invisible: scores are exactly base-only
      got == after || got == baseOnly
  }

  // ---- 5. IVF vector ingest (float delta + coded delta)

  private object IvfIngest extends CrashCase {
    val name = "ivf vector ingest"
    val op = "ivf-ingest"
    private def base = emb.filter(col("vec_id") < 400)
    private def delta =
      emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
        .select(col("vec_id"), col("embedding"))
    def setup(dir: String): Unit = { VectorIndex.ensureIvfPq(base, dir); () }
    def mutate(dir: String): Unit =
      graft.pipeline.VectorIngestPipeline.ingestBatch(delta, dir, 0L)
    def observe(dir: String): Seq[String] = {
      // the planted-arrival probe: a query that IS delta vector 420
      // (fresh id, so self-exclusion doesn't hide it) must surface it
      // at sim 1.0 through WHATEVER path the window leaves valid
      // (exact fallback for floats-without-codes, ADC once coded)
      val probe = emb.filter(col("vec_id") === 420)
        .select(lit(9999L).as("vec_id"), col("embedding"))
      val r = VectorIndex.queryIvfPq(spark, dir, probe, 1)
        .collect().head
      Seq(s"${r.getLong(1)} ${r.getDouble(2)}")
    }
  }

  // ---- 6. BM25 delta compaction (maintenance fold: detectable-or-exact)

  private object Bm25Compact extends CrashCase {
    val name = "bm25 delta compaction"
    val op = "bm25-compact"
    private def base = docs.filter(col("doc_id") < 400)
    private def arrivals =
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 430)
    private def full = docs.filter(col("doc_id") < 430)
    private val terms = Seq("window", "merge", "dup")
    def setup(dir: String): Unit = {
      Bm25.ensurePostings(base, dir)
      Bm25.appendPostings(arrivals, dir, batchId = 0L)
    }
    def mutate(dir: String): Unit = Bm25.compactDeltas(spark, dir)
    def observe(dir: String): Seq[String] =
      Bm25.scoreTopKIndexed(spark, dir, terms, 15).collect()
        .map(r => s"${r.getLong(0)} ${r.getDouble(1)} ${r.getLong(2)}")
        .toSeq
    override def acceptable(dir: String, after: Seq[String],
        got: Seq[String]): Boolean =
      // a window where the read could be inexact must still hold its
      // delta dirs — the documented check-before-retry signal
      got == after || {
        val fs = Hdfs.of(spark, dir)
        fs.exists(new org.apache.hadoop.fs.Path(s"$dir/postings_delta"))
      }
    override def heal(dir: String): Unit = {
      // the contract's remediation: never blind-retry a maintenance
      // fold — rebuild the index from source (stamp deleted so the
      // rebuild is unconditional; ensurePostings clears stale deltas)
      val fs = Hdfs.of(spark, dir)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      Bm25.ensurePostings(full, dir)
    }
  }

  // ---- 7. IVF delta compaction (maintenance fold)

  private object IvfCompact extends CrashCase {
    val name = "ivf delta compaction"
    val op = "ivf-compact"
    private def base = emb.filter(col("vec_id") < 400)
    private def delta =
      emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
        .select(col("vec_id"), col("embedding"))
    def setup(dir: String): Unit = {
      VectorIndex.ensureIvfPq(base, dir)
      graft.pipeline.VectorIngestPipeline.ingestBatch(delta, dir, 0L)
    }
    def mutate(dir: String): Unit =
      graft.pipeline.VectorIngestPipeline.compactDeltas(spark, dir)
    def observe(dir: String): Seq[String] = IvfIngest.observe(dir)
    override def acceptable(dir: String, after: Seq[String],
        got: Seq[String]): Boolean =
      got == after || {
        val fs = Hdfs.of(spark, dir)
        fs.exists(new org.apache.hadoop.fs.Path(s"$dir/cells_delta"))
      }
    override def heal(dir: String): Unit = {
      val fs = Hdfs.of(spark, dir)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      VectorIndex.ensureIvfPq(
        emb.filter(col("vec_id") < 450), dir)
    }
  }

  // ---- 8. SampleLayout rebuild (write = gc + invisible base + flip)

  private object SampleWrite extends CrashCase {
    val name = "sample layout rebuild"
    val op = "sample-write"
    private def events = Tables.events(spark, sf0001)
    def setup(dir: String): Unit =
      SampleLayout.write(events, dir, col("user_id"), Seq("ts"),
        files = 4)
    // the mutation under sweep: a REBUILD over an existing layout —
    // the next generation lands invisible, the manifest flips, the
    // superseded base lingers one publish as grace
    def mutate(dir: String): Unit = setup(dir)
    def observe(dir: String): Seq[String] = SampleCompact.observe(dir)
  }

  // ---- 9. Media ingest (stats + rejects, batchId-keyed overwrites)

  private object MediaIngest extends CrashCase {
    val name = "media ingest batch"
    val op = "media-ingest"
    private def batchDf = {
      val b64 = java.util.Base64.getEncoder
      def png(id: Long) = b64.encodeToString(
        graft.ops.Multimodal.pngBytes(4, 2, (x, y) =>
          graft.ops.Multimodal.packRgb(
            ((id * 17 + x) % 256).toInt, ((id * 19 + y) % 256).toInt,
            ((id * 23 + x + y) % 256).toInt)))
      def wav(id: Long) = b64.encodeToString(
        graft.ops.Multimodal.wavBytes(8000,
          Array.tabulate(16)(i => ((id * 31 + i * 17) % 256).toByte)))
      Seq((0L, png(0L), "png"), (1L, wav(1L), "wav"),
        (2L, png(2L), "png"),
        (9L, b64.encodeToString("corrupt".getBytes), "png"))
        .toDF("doc_id", "media_b64", "format")
    }
    def setup(dir: String): Unit = () // ingest into an empty store
    def mutate(dir: String): Unit =
      graft.pipeline.MediaPipeline.ingestBatch(batchDf, dir, 3L)
    def observe(dir: String): Seq[String] =
      (graft.pipeline.MediaPipeline.stats(spark, dir)
        .select("doc_id").collect().map(r => s"s${r.getLong(0)}") ++
        graft.pipeline.MediaPipeline.rejects(spark, dir)
          .select("doc_id").collect().map(r => s"r${r.getLong(0)}"))
        .toSeq.sorted
    // a crash between the two writes leaves the stats delta committed
    // and the rejects delta absent — a complete consistent view of a
    // PARTIALLY landed batch; the checkpoint replay overwrites both
    override def acceptable(dir: String, after: Seq[String],
        got: Seq[String]): Boolean =
      got == after || got == after.filter(_.startsWith("s"))
  }

  // ---- 9b. Media ingest with the phash-dedup tier (4 steps)

  private object MediaDedupIngest extends CrashCase {
    val name = "media ingest dedup batch"
    val op = "media-ingest-dedup"
    private val b64 = java.util.Base64.getEncoder
    private def img(k: Long, up: Boolean): String =
      if (!up) b64.encodeToString(graft.ops.Multimodal.bmpBytes(8, 4,
        (x, y) => graft.ops.Multimodal.packRgb(
          graft.ops.Multimodal.synthCell(k, x, y, 0),
          graft.ops.Multimodal.synthCell(k, x, y, 1),
          graft.ops.Multimodal.synthCell(k, x, y, 2))))
      else b64.encodeToString(graft.ops.Multimodal.pngBytes(16, 8,
        (x, y) => graft.ops.Multimodal.packRgb(
          graft.ops.Multimodal.synthCell(k, x / 2, y / 2, 0),
          graft.ops.Multimodal.synthCell(k, x / 2, y / 2, 1),
          graft.ops.Multimodal.synthCell(k, x / 2, y / 2, 2))))
    def setup(dir: String): Unit =
      // batch 0 seeds the phash store with image k=0
      graft.pipeline.MediaPipeline.ingestBatch(
        Seq((0L, img(0L, up = false), "bmp"))
          .toDF("doc_id", "media_b64", "format"),
        dir, 0L, phashDedup = true)
    def mutate(dir: String): Unit =
      // batch 1: a cross-batch dup (upscale of k=0), a fresh image,
      // a within-batch dup of it, and a corrupt payload — every sink
      // receives rows, so every crash window is distinguishable
      graft.pipeline.MediaPipeline.ingestBatch(
        Seq((10L, img(0L, up = true), "png"),
          (12L, img(4L, up = false), "bmp"),
          (14L, img(4L, up = true), "png"),
          (9L, java.util.Base64.getEncoder
            .encodeToString("junk".getBytes), "png"))
          .toDF("doc_id", "media_b64", "format"),
        dir, 1L, phashDedup = true)
    def observe(dir: String): Seq[String] =
      (graft.pipeline.MediaPipeline.stats(spark, dir)
        .select("doc_id").collect().map(r => s"s${r.getLong(0)}") ++
        graft.pipeline.MediaPipeline.rejects(spark, dir)
          .select("doc_id").collect().map(r => s"r${r.getLong(0)}") ++
        graft.pipeline.MediaPipeline.dups(spark, dir)
          .select("doc_id").collect().map(r => s"d${r.getLong(0)}"))
        .toSeq.sorted
    // steps land in order (stats, rejects, dups, store append), each
    // batchId-keyed: every crash window shows a stage-prefix of the
    // committed batch — and the checkpoint replay overwrites all four
    override def acceptable(dir: String, after: Seq[String],
        got: Seq[String]): Boolean = {
      val s = after.filter(_.startsWith("s"))
      val r = after.filter(_.startsWith("r"))
      // the injected crash fires AFTER a step's write is durable, so
      // the observable windows are: stats only, stats+rejects,
      // stats+rejects+dups (== after; the store append is not in the
      // observation, its loss only re-admits a future dup until the
      // replay heals it)
      Seq(s.sorted, (s ++ r).sorted, after).exists(_ == got)
    }
  }

  // ---- 10. BM25 result-cache memo GC (write-survivors-first, then
  // delete-superseded — round-12 ADVICE flipped the order so no crash
  // window can empty the memo)

  private object MemoCompact extends CrashCase {
    val name = "bm25 memo compact"
    val op = "bm25-memo-compact"
    private val ts = Seq("key", "join")
    private def idx(dir: String) = s"$dir/idx"
    private def memo(dir: String) = s"$dir/memo"
    private def qs = Seq(("q", ts)).toDF("query_id", "terms")
    def setup(dir: String): Unit = {
      graft.ops.Bm25.ensurePostings(docs, idx(dir))
      // populate the memo: one live termset + one that GC will drop
      graft.ops.Bm25ResultCache.scoreTopKCachedBatch(spark, idx(dir),
        memo(dir), qs, 5).count()
      graft.ops.Bm25ResultCache.scoreTopKCachedBatch(spark, idx(dir),
        memo(dir), Seq(("s", Seq("spark"))).toDF("query_id", "terms"),
        5).count()
    }
    def mutate(dir: String): Unit =
      graft.ops.Bm25ResultCache.compact(spark, idx(dir), memo(dir),
        liveTermsets = Seq(ts), k = 5)
    // the cache is answer-NEUTRAL: every crash window (memo empty,
    // memo partial, memo compacted) must return the identical scored
    // answer — hits replay memoized exact results, misses recompute
    def observe(dir: String): Seq[String] =
      graft.ops.Bm25ResultCache.scoreTopKCachedBatch(spark, idx(dir),
          memo(dir), qs, 5)
        .collect()
        .map(r => s"${r.getString(0)}|${r.getLong(1)}|${
          r.getDouble(2)}|${r.getLong(3)}")
        .toSeq.sorted
  }

  private val cases: Seq[CrashCase] = Seq(AggFold, SampleCompact,
    SampleWrite, GramReplay, Bm25Ingest, IvfIngest, Bm25Compact,
    IvfCompact, MediaIngest, MediaDedupIngest, MemoCompact)

  cases.foreach { c =>
    test(s"${c.name}: killed between every pair of steps, every " +
        "window honors the store's crash contract") {
      // clean discovery run: registers the op's step list and fixes
      // the committed answer every window is judged against
      val clean = tmpDir(s"crash-${c.op}-clean")
      c.setup(clean)
      c.mutate(clean)
      val after = c.observe(clean)
      assert(after.nonEmpty, s"${c.name}: empty committed answer")
      val steps = CommitProtocol.stepsOf(c.op)
      assert(steps.nonEmpty, s"${c.name}: op ${c.op} never registered")

      steps.indices.foreach { i =>
        val dir = tmpDir(s"crash-${c.op}-$i")
        c.setup(dir)
        CommitProtocol.crashAfter = Some((c.op, i))
        val e = try intercept[CommitProtocol.InjectedCrash] {
          c.mutate(dir)
        } finally CommitProtocol.crashAfter = None
        assert(e.afterStep == steps(i))
        // the crash-window read must neither throw nor violate the
        // store's contract
        val got = c.observe(dir)
        assert(c.acceptable(dir, after, got),
          s"${c.name}: unacceptable read after crash at " +
            s"'${steps(i)}': got $got, committed $after")
        // remediation restores the committed answer exactly
        c.heal(dir)
        val healed = c.observe(dir)
        assert(healed == after,
          s"${c.name}: heal after crash at '${steps(i)}' " +
            s"diverged: $healed vs $after")
      }
    }
  }
}
