package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{GramBloom, GraftExtensions}

class TextSkipIndexSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  private lazy val layout: String = {
    val p = tmpDir("gramidx") + "/docs"
    TextSkipIndex.ensureDocuments(docs, p)
    p
  }

  private def totalFiles: Long =
    spark.read.parquet(s"$layout/_gram_blooms").count()

  test("ngram blooms prune a substring probe; absent needles read zero files") {
    val total = totalFiles
    assert(total >= 8, s"granularity too coarse to observe skipping: $total")
    // 'dup dup' lives in ~3 docs: the cross-word grams isolate a few
    // files (plus bloom false positives at 1% per gram per file)
    val hit = TextSkipIndex.survivingFiles(spark, layout, "dup dup",
      token = false)
    info(s"'dup dup' survivors: ${hit.size}/$total")
    assert(hit.nonEmpty && hit.size < total,
      s"phrase probe should skip files: ${hit.size}/$total")
    // a needle absent from the corpus prunes everything
    val miss = TextSkipIndex.survivingFiles(spark, layout, "xyzzyq",
      token = false)
    assert(miss.isEmpty, s"absent needle must prune all files: $miss")
    assert(TextSkipIndex.searchSubstring(spark, layout, "xyzzyq")
      .count() == 0)
  }

  test("substring search through the index equals the unindexed scan") {
    val viaIndex = TextSkipIndex
      .searchSubstring(spark, layout, "dup dup")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val direct = docs.filter(col("text").contains("dup dup"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(direct.nonEmpty)
    assert(viaIndex == direct)
  }

  test("token search equals the exact token filter; absent token prunes all") {
    val viaIndex = TextSkipIndex.searchToken(spark, layout, "dup")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val direct = docs
      .filter(array_contains(split(col("text"), GramBloom.TokenSep),
        "dup"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(direct.nonEmpty)
    assert(viaIndex == direct)
    assert(TextSkipIndex.survivingFiles(spark, layout, "zzz",
      token = true).isEmpty)
    // pruned-to-zero result keeps the layout schema
    val empty = TextSkipIndex.searchToken(spark, layout, "zzz")
    assert(empty.columns.toSeq ==
      spark.read.parquet(s"$layout/data").columns.toSeq)
    assert(empty.count() == 0)
    intercept[IllegalArgumentException] {
      TextSkipIndex.searchToken(spark, layout, "two words")
    }
  }

  test("a needle shorter than the gram width cannot prune (must scan)") {
    val s = TextSkipIndex.survivingFiles(spark, layout, "du",
      token = false)
    assert(s.size == totalFiles)
  }

  test("SQL surface parity: gram_bloom + gram_bloom_admits match the Column API") {
    GraftExtensions.register(spark)
    docs.limit(100).createOrReplaceTempView("gram_docs")
    // one bloom over the whole slice, probed for a present and an
    // absent token — same answers as the Column-API build
    val sqlRow = spark.sql(
      """SELECT gram_bloom_admits(b, 'dup', 0) AS present,
        |       gram_bloom_admits(b, 'xyzzyq', 0) AS absent
        |FROM (SELECT gram_bloom(text, 0, 65536, 0.01) AS b
        |      FROM gram_docs)""".stripMargin).head()
    assert(sqlRow.getBoolean(0))
    assert(!sqlRow.getBoolean(1))
    val colRow = docs.limit(100)
      .agg(GramBloom.gram_bloom(col("text"), 0, 65536L, 0.01).as("b"))
      .select(
        GramBloom.gram_bloom_admits(col("b"), "dup", 0).as("present"),
        GramBloom.gram_bloom_admits(col("b"), "xyzzyq", 0).as("absent"))
      .head()
    assert(colRow.getBoolean(0) && !colRow.getBoolean(1))
  }

  test("partial-merge lawfulness: no gram inserted on any side is ever rejected") {
    // force many partitions so the final bloom is a merge of partials;
    // every token of every doc must still be admitted (blooms have no
    // false negatives, and mergeInPlace must preserve that)
    val bloom = docs.repartition(7)
      .agg(GramBloom.gram_bloom(col("text"), 0, 65536L, 0.01))
      .head().getAs[Array[Byte]](0)
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom))
    val toks = docs.select(explode(split(col("text"),
        GramBloom.TokenSep)).as("t"))
      .filter(col("t") =!= "").distinct()
      .collect().map(_.getString(0))
    assert(toks.length > 10)
    assert(toks.forall(bf.mightContainString),
      "merged bloom dropped an inserted gram (false negative)")
  }

  test("batchId-keyed append: planted arrival searchable on commit, replay idempotent") {
    import spark.implicits._
    val p = tmpDir("gramidx-append") + "/docs"
    TextSkipIndex.ensureDocuments(docs, p)
    val planted = Seq(
      (900001L, "freshzz skip index arrival freshzz", "en", "srcX",
        34L),
      (900002L, "another plain arrival row", "en", "srcX", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // invisible before the append commits
    assert(TextSkipIndex.searchToken(spark, p, "freshzz").count() == 0)
    TextSkipIndex.append(planted, p, batchId = 1)
    val hit = TextSkipIndex.searchToken(spark, p, "freshzz")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(900001L))
    assert(TextSkipIndex
      .searchSubstring(spark, p, "freshzz skip").count() == 1)
    // the delta probe PRUNES: only the planted batch's file survives
    val survivors = TextSkipIndex.survivingFiles(spark, p, "freshzz",
      token = true)
    assert(survivors.size == 1 && survivors.head.contains("/b_1/"),
      s"expected just the batch file: $survivors")
    // base rows still found across base + delta
    val viaIndex = TextSkipIndex.searchToken(spark, p, "dup")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val direct = docs.unionByName(planted)
      .filter(array_contains(split(col("text"), GramBloom.TokenSep),
        "dup"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaIndex == direct && direct.nonEmpty)
    // replaying the same batch is idempotent (Overwrite both dirs)
    TextSkipIndex.append(planted, p, batchId = 1)
    assert(TextSkipIndex.searchToken(spark, p, "freshzz")
      .count() == 1)
  }

  test("replay of a committed batch never leaves dangling sidecar refs " +
      "(retract-first protocol: every crash window reads invisible)") {
    import spark.implicits._
    val p = tmpDir("gramidx-replay") + "/docs"
    TextSkipIndex.ensureDocuments(docs, p)
    val planted = Seq(
      (920001L, "replayzz crash window probe", "en", "srcR", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    TextSkipIndex.append(planted, p, batchId = 7)
    assert(TextSkipIndex.searchToken(spark, p, "replayzz").count() == 1)
    // simulate the replay crash window append now walks through:
    // sidecar retracted FIRST, data rewritten (fresh part-file UUIDs),
    // crash before the sidecar recommit
    val fs = Hdfs.of(spark, p)
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/_gram_blooms/b_7"),
      true)
    planted.repartition(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$p/data/b_7")
    // mid-window: the batch is invisible — searches must not throw on
    // deleted paths (the pre-fix ordering left the committed sidecar
    // pointing at files the data Overwrite had just deleted)
    assert(TextSkipIndex.searchToken(spark, p, "replayzz").count() == 0)
    assert(TextSkipIndex.searchToken(spark, p, "dup").count() ==
      docs.filter(array_contains(
        split(col("text"), GramBloom.TokenSep), "dup")).count())
    // the next replay heals both dirs
    TextSkipIndex.append(planted, p, batchId = 7)
    assert(TextSkipIndex.searchToken(spark, p, "replayzz").count() == 1)
    // invariant the protocol exists for: every committed sidecar row
    // references a live data file
    val referenced = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$p/_gram_blooms").select("file").collect()
      .map(_.getString(0))
    referenced.foreach { f =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(f)),
        s"dangling sidecar ref: $f")
    }
  }

  test("foreachBatch maintenance: a streamed arrival is searchable once its batch commits") {
    val p = tmpDir("gramidx-stream") + "/docs"
    TextSkipIndex.ensureDocuments(docs, p)
    val src = tmpDir("gramidx-src")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "b0.json"),
      ("""{"doc_id": 910001, "text": "streamedzz arrival body",""" +
        """ "lang": "en", "source": "srcS", "n_chars": 23}""")
        .getBytes("UTF-8"))
    val q = spark.readStream.schema(docs.schema).json(src)
      .writeStream
      .option("checkpointLocation", tmpDir("gramidx-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        TextSkipIndex.append(b, p, id)
      }
      .start()
    q.awaitTermination()
    val hit = TextSkipIndex.searchToken(spark, p, "streamedzz")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(910001L))
  }

  test("ensure is idempotent and a torn marker forces a rebuild") {
    val fs = Hdfs.of(spark, layout)
    val marker = new org.apache.hadoop.fs.Path(s"$layout/_graft_meta")
    val t0 = fs.getFileStatus(marker).getModificationTime
    TextSkipIndex.ensureDocuments(docs, layout) // current -> no-op
    assert(fs.getFileStatus(marker).getModificationTime == t0)
    val out = fs.create(marker, true) // torn marker
    try out.write("rows=7".getBytes("UTF-8")) finally out.close()
    TextSkipIndex.ensureDocuments(docs, layout) // stale -> rebuild
    val in = fs.open(marker)
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    // fingerprint + every layout param (gram width, grain, bloom size)
    assert(s == s"rows=${docs.count()};n=${TextSkipIndex.N};" +
      "files=16;grams=65536;fpp=0.01")
  }
}
