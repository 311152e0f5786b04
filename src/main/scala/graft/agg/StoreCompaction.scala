package graft.agg

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared compaction mechanics for the append-log stores
  * ([[SummingStore]], [[CollapsingStore]]): fold per-batch dirs into
  * one generation-named `batch=compacted-<g>` block, atomically
  * publish the new generation via a manifest, and only then retire
  * superseded dirs — so a concurrent reader ALWAYS sees one complete,
  * consistent view, matching ClickHouse's background merges
  * (kafka+clickhouse.md:396-401), which never expose readers to
  * partial state.
  *
  * Reader-safety protocol (the MVCC-with-grace layout Delta-style
  * logs use, reduced to one generation pointer):
  *
  *   1. The folded block lands under `batch=compacted-<g+1>` — a name
  *      the CURRENT manifest (generation g) does not admit, so it is
  *      invisible to every reader.
  *   2. The replay watermark (`_compacted_through`) advances. A crash
  *      here can only make `append` REFUSE a replay of a
  *      not-yet-published batch (safe; the batch-keyed overwrite was
  *      idempotent anyway), never accept a double-count.
  *   3. The manifest is atomically REPLACED (write-temp + rename):
  *      readers flip from {compacted-g, numeric > through_g} to
  *      {compacted-(g+1), numeric > through_(g+1)} in one step —
  *      both views are complete; no interleaving sees partial data.
  *   4. Dirs superseded by the PREVIOUS publish are deleted. Dirs
  *      superseded just now stay on disk (invisible via the manifest)
  *      until the NEXT fold — the grace window for readers that
  *      resolved their file listing before step 3. Disk holds at most
  *      two generations; reads never scan the retired one.
  *
  * The watermark lives in a `_compacted_through` marker file beside
  * the batch dirs; the manifest in `_manifest`. Readers' dir listings
  * go through [[visibleBatchDirs]], which filters by the manifest (no
  * manifest = never compacted under this scheme = every dir visible,
  * including a legacy `batch=compacted` block). New batches with ids
  * above the watermark append normally, so periodic compaction
  * composes with an ongoing stream.
  */
private[agg] object StoreCompaction {

  private def marker(storePath: String) =
    new Path(s"$storePath/_compacted_through")

  private def manifestPath(storePath: String) =
    new Path(s"$storePath/_manifest")

  private def readThrough(fs: FileSystem, storePath: String): Long = {
    val m = marker(storePath)
    if (!fs.exists(m)) -1L
    else {
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  /** Write-temp + atomic rename — shared [[graft.scale.Hdfs.atomicWrite]]
    * (review-caught origin: a truncate-in-place fs.create let a
    * concurrent reader see an empty or torn marker — crashing
    * readThrough, or worse, under-reading the watermark so append
    * ACCEPTED a replay of a folded batch). */
  private def atomicWrite(fs: FileSystem, target: Path,
      content: String): Unit =
    graft.scale.Hdfs.atomicWrite(fs, target, content)

  private def writeThrough(fs: FileSystem, storePath: String,
      through: Long): Unit =
    atomicWrite(fs, marker(storePath), through.toString)

  /** Highest batch id folded into a compacted block so far, or -1 if
    * never compacted (every real batch id is >= 0). */
  def compactedThrough(spark: SparkSession, storePath: String): Long =
    readThrough(graft.scale.Hdfs.of(spark, storePath), storePath)

  /** The published view: generation number + the batch-id watermark at
    * its publish time. Absent until the first manifest-scheme fold. */
  private[agg] final case class Manifest(gen: Long, through: Long)

  private[agg] def readManifest(fs: FileSystem,
      storePath: String): Option[Manifest] = {
    val m = manifestPath(storePath)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      // defensive parse (review-caught alongside the SampleLayout
      // twin): a torn/malformed manifest must name the path, not die
      // as a bare MatchError
      txt.split(' ') match {
        case Array(g, t) if g.toLongOption.isDefined &&
            t.toLongOption.isDefined =>
          Some(Manifest(g.toLong, t.toLong))
        case _ => throw new IllegalStateException(
          s"torn/malformed store manifest at $m: '$txt' — on a " +
            "filesystem without atomic rename retry; otherwise " +
            "restore the marker or recompact")
      }
    }
  }

  /** Atomic publish: write to a temp name, rename over `_manifest`.
    * POSIX rename replaces atomically; on HDFS the FileContext rename
    * with OVERWRITE has the same contract. Readers therefore see
    * either the old manifest or the new one, never a torn write. */
  private def publishManifest(fs: FileSystem, storePath: String,
      m: Manifest): Unit =
    atomicWrite(fs, manifestPath(storePath), s"${m.gen} ${m.through}")

  private def listBatchDirs(fs: FileSystem,
      storePath: String): Array[FileStatus] = {
    val base = new Path(storePath)
    if (!fs.exists(base)) Array.empty
    else fs.listStatus(base).filter(_.getPath.getName.startsWith("batch="))
  }

  private def numericId(dirName: String): Option[Long] =
    dirName.stripPrefix("batch=").toLongOption

  /** Is `dirName` part of the view `manifest` admits? No manifest =
    * pre-scheme store: everything is visible (legacy behavior,
    * including an old un-suffixed `batch=compacted`) — EXCEPT a
    * generation-suffixed `batch=compacted-<g>` block, which only this
    * scheme produces: with no manifest on disk it can only be a
    * FIRST fold's landed-but-unpublished block, and admitting it
    * double-counts every batch it absorbed against the still-present
    * batch dirs (found by the CommitCrashSpec sweep: crash between
    * land and publish on a never-compacted store). */
  private def isVisible(dirName: String,
      manifest: Option[Manifest]): Boolean = manifest match {
    case None =>
      dirName.stripPrefix("batch=compacted-").toLongOption.isEmpty
    case Some(Manifest(g, t)) =>
      dirName == s"batch=compacted-$g" || numericId(dirName).exists(_ > t)
  }

  /** The dirs a reader may scan: manifest-filtered listing, further
    * restricted to dirs that actually HOLD data files. A rows-less
    * dir exists legitimately — an anonymous append claims its dir
    * (marker) BEFORE the rows land, so a crash in that window leaves
    * `batch=N/_graft_anon` alone on disk forever (retries go above
    * via maxBatchId) — and a parquet read over only such dirs dies in
    * schema inference (review-caught: it crashed read() and compact()
    * on exactly the crash shape the marker ordering calls safe).
    *
    * This is the ONLY way store reads should list batch dirs — the
    * raw `batch=*` glob would double-count a
    * retired-but-not-yet-deleted generation against the block that
    * absorbed it. */
  def visibleBatchDirs(fs: FileSystem, storePath: String): Seq[String] = {
    val m = readManifest(fs, storePath)
    // ONE glob resolves data presence for every batch dir at once —
    // the previous per-dir listStatus added one RPC per visible dir
    // per read (the N+1 pattern the SampleLayout reader deliberately
    // avoids) AND caught every Throwable, so a transient IO failure
    // silently dropped a committed batch from the view (round-10
    // ADVICE, medium). Only FileNotFoundException — the legitimate
    // concurrent-GC race, a retired dir deleted between the listing
    // and the stat — is tolerated (one bounded retry, then the
    // vanished paths are genuinely gone); any other IOException
    // propagates, keeping the store's fail-loud discipline.
    def dataDirNamesOnce(): Set[String] = {
      val stats = fs.globStatus(new Path(s"$storePath/batch=*/*"))
      if (stats == null) Set.empty[String]
      else stats.iterator.filter { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }.map(_.getPath.getParent.getName).toSet
    }
    // a fold's retire step deletes MANY dirs in a sequential loop, so
    // several back-to-back globs can each hit a different mid-delete
    // dir — retry with a short pause until the glob completes cleanly
    // (bounded), then fail LOUDLY rather than return an empty view
    // that silently drops every committed batch (two review rounds:
    // the first cut fell back to Set.empty — a store-wide silent
    // undercount; the second threw after exactly two attempts, which
    // a healthy multi-dir GC sweep can legitimately outlast)
    val dataDirs = {
      var attempt = 0
      var out: Option[Set[String]] = None
      var last: java.io.FileNotFoundException = null
      while (out.isEmpty && attempt < 6) {
        try out = Some(dataDirNamesOnce())
        catch {
          case e: java.io.FileNotFoundException =>
            last = e
            attempt += 1
            Thread.sleep(50L * attempt)
        }
      }
      out.getOrElse(throw new IllegalStateException(
        s"store $storePath: batch-dir listing hit " +
          s"FileNotFoundException on $attempt consecutive attempts — " +
          "beyond any concurrent-GC sweep; refusing to return a " +
          "possibly-partial view", last))
    }
    listBatchDirs(fs, storePath).map(_.getPath.getName)
      .filter(isVisible(_, m)).filter(dataDirs).toSeq.sorted
      .map(n => s"$storePath/$n")
  }

  /** True iff the store has at least one VISIBLE batch dir — the
    * precondition for a schema probe / fold. */
  def hasBatchDirs(fs: FileSystem, storePath: String): Boolean =
    visibleBatchDirs(fs, storePath).nonEmpty

  /** Marker written inside anonymously-appended batch dirs (ignored
    * by parquet readers — underscore-prefixed). An anonymous append
    * lands at max(on-disk id, watermark)+1, which is exactly the id a
    * CHECKPOINTED stream writing the same store will use for its next
    * micro-batch — and that stream's idempotent overwrite-by-batchId
    * would silently clobber the anonymous rows (review-caught, round-9
    * ADVICE). A store is either streamed-into or batch-appended
    * (single-writer discipline); the marker turns a violation into a
    * loud error at the keyed append instead of silent data loss. */
  private val AnonMarker = "_graft_anon"

  def markAnon(fs: FileSystem, storePath: String, batchId: Long): Unit =
    fs.create(new Path(s"$storePath/batch=$batchId/$AnonMarker"), true)
      .close()

  /** Refuse a keyed (streamed) append into a dir an anonymous append
    * owns — see [[markAnon]]. */
  def assertNotAnon(fs: FileSystem, storePath: String,
      batchId: Long): Unit =
    require(!fs.exists(new Path(s"$storePath/batch=$batchId/$AnonMarker")),
      s"batch $batchId was appended anonymously (batch-mode); " +
        "overwriting it from a streamed writer would silently drop " +
        "those rows. A store is either streamed-into or " +
        "batch-appended — use separate stores, or key every append")

  /** Highest numeric batch id ON DISK (visible or not), or -1 on an
    * empty store. Batch-mode appends land at max(this, watermark)+1:
    * watermark+1 alone can COLLIDE with a streamed batch above the
    * watermark that a concurrent fold is absorbing — rows appended
    * into that dir mid-fold would go invisible at publish and be
    * deleted by the next fold's retirement (review-caught). */
  def maxBatchId(fs: FileSystem, storePath: String): Long =
    listBatchDirs(fs, storePath)
      .flatMap(st => numericId(st.getPath.getName))
      .foldLeft(-1L)(math.max)

  /** Pre-manifest crash shapes have no recovery to do anymore (the
    * fold never deletes before publishing); an orphaned temp dir from
    * a legacy-scheme crash is simply absorbed: if the store has no
    * visible dirs and a temp block exists, publish it as generation 0.
    * An entirely empty store is a no-op. */
  def recoverOrNoop(fs: FileSystem, storePath: String, tmp: Path): Unit =
    if (fs.exists(tmp)) {
      val gen = readManifest(fs, storePath).map(_.gen + 1).getOrElse(0L)
      val dst = new Path(s"$storePath/batch=compacted-$gen")
      if (fs.exists(dst)) fs.delete(dst, true)
      require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed; " +
        "folded rows remain in the temp dir")
      publishManifest(fs, storePath,
        Manifest(gen, readThrough(fs, storePath)))
    }

  /** Publish the pre-materialized folded block at `tmp` as the next
    * generation and retire the dirs it absorbed — reader-safe per the
    * protocol above: land invisible, advance the replay watermark,
    * atomically flip the manifest, and defer deleting the
    * just-superseded dirs to the NEXT fold (grace for in-flight
    * readers).
    *
    * `foldedDirs` is the EXACT [[visibleBatchDirs]] view the caller
    * materialized `tmp` from: the new watermark derives from what is
    * actually IN the folded block, never from a re-listing
    * (review-caught: re-listing absorbed a batch appended between the
    * caller's snapshot and the fold — its rows, absent from `tmp`,
    * went invisible and were later deleted). A batch landing after the
    * snapshot carries a HIGHER id than everything folded (streaming
    * batch ids are monotone; batch-mode appends take
    * max(on-disk id, watermark)+1 via [[maxBatchId]] — watermark+1
    * alone could collide with a streamed dir that is mid-fold), so it
    * stays visible under the new manifest.
    */
  def foldBatches(fs: FileSystem, storePath: String, tmp: Path,
      foldedDirs: Seq[String]): Unit = {
    val cur = readManifest(fs, storePath)
    val dirs = listBatchDirs(fs, storePath)
    val newGen = cur.map(_.gen + 1).getOrElse(0L)
    val dst = new Path(s"$storePath/batch=compacted-$newGen")
    // the destination name is EXCLUDED from retirement: a crashed
    // prior attempt at this generation is replaced by the rename in
    // step 1, and must not be deleted in step 4 AFTER it became the
    // published block (review-caught data-loss path)
    val staleBefore = dirs.map(_.getPath.getName)
      .filterNot(isVisible(_, cur))
      .filterNot(_ == dst.getName).toSet

    var maxId = readThrough(fs, storePath)
    foldedDirs.map(p => new Path(p).getName).foreach(n =>
      numericId(n).foreach(id => maxId = math.max(maxId, id)))

    // the four-step protocol, run through the shared executor so the
    // crash spec sweeps every inter-step window (CommitProtocol doc)
    import graft.scale.CommitProtocol.{run, step}
    run("store-fold", Seq(
      // 1. land the folded block under its generation name — invisible
      //    until the manifest flips (a crashed prior attempt at this
      //    same generation is itself invisible: clear it first)
      step("land-folded-block") {
        if (fs.exists(dst)) fs.delete(dst, true)
        require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed; " +
          "folded rows remain in the temp dir")
      },
      // 2. replay watermark BEFORE publish: a crash here only REFUSES
      //    a replay (safe), never double-counts
      step("advance-watermark") {
        writeThrough(fs, storePath, maxId)
      },
      // 3. ATOMIC PUBLISH: complete-view -> complete-view flip
      step("publish-manifest") {
        publishManifest(fs, storePath, Manifest(newGen, maxId))
      },
      // 4. deferred retirement: delete only what was ALREADY invisible
      //    before this publish — dirs superseded just now survive one
      //    more fold as the in-flight readers' grace window
      step("retire-superseded") {
        dirs.filter(st => staleBefore(st.getPath.getName))
          .foreach(st => fs.delete(st.getPath, true))
      }))
  }

  /** Cast `folded` back to the raw batch schema so post-compact
    * appends (original-width rows) still union cleanly at read time —
    * FAILING loudly on any value the narrower type cannot hold. Sums
    * widen int columns to long (and decimals to higher precision); a
    * non-ANSI downcast silently wraps an overflowing long and nulls
    * an overflowing decimal, permanently corrupting the store. The
    * guard is a per-row try_cast round-trip compiled into the same
    * projection (no extra pass, ANSI-mode-independent): a value that
    * does not survive `try_cast(target)` and cast back unchanged
    * raises instead of writing.
    */
  def castToRawSchema(folded: DataFrame, rawSchema: StructType): DataFrame =
    folded.select(folded.schema.fields.map { f =>
      val target = rawSchema(f.name).dataType
      if (target == f.dataType) col(f.name)
      else {
        val down = col(f.name).try_cast(target)
        when(col(f.name).isNotNull &&
            (down.isNull || down.cast(f.dataType) =!= col(f.name)),
          raise_error(concat(
            lit(s"compact(): folded total for column '${f.name}' does " +
              s"not fit the stored $target type (widen the store's " +
              "column type or compact more often): "),
            col(f.name).cast("string"))))
          .otherwise(down).as(f.name)
      }
    }.toSeq: _*)
}
