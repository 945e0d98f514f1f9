package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-committed snapshot versioning ([[SnapshotDir]]) — the
  * round-13 opt-in upgrade of the plain-parquet index dirs. What it must
  * buy (and what these tests pin): a reader pinned BEFORE maintenance
  * keeps materializing AFTER it (the plain form's documented
  * FILE_NOT_EXIST limitation), uncommitted data files are invisible
  * (crash-anywhere safety without a swap protocol), probe results are
  * identical to the plain form across the whole lifecycle, and gc
  * reclaims everything no kept version references.
  */
class SnapshotDirSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("versioned lifecycle: append/rewrite commit new versions; a " +
      "pinned pre-compaction reader survives the compaction") {
    val dir = tmp("graft-snap") + "/t"
    (0L until 50L).toDF("id").repartition(2)
      .write.mode("overwrite").parquet(dir)
    SnapshotDir.enable(spark, dir)
    // v1 pins the two original files
    val v1 = Dedup.snapshotFiles(spark, dir)
    assert(v1.size == 2)
    // append lands in a segment + new manifest; a fresh load sees it
    Dedup.appendParquet((50L until 60L).toDF("id"), dir)
    val afterAppend = spark.read
      .parquet(Dedup.snapshotFiles(spark, dir): _*)
      .collect().map(_.getLong(0)).toSet
    assert(afterAppend == (0L until 60L).toSet)
    // the headline: pin a reader, compact UNDER it, reader still works
    // (the plain-parquet form fails here with FILE_NOT_EXIST — the
    // documented limitation this layer removes)
    val pinned = spark.read.parquet(Dedup.snapshotFiles(spark, dir): _*)
    Dedup.compactParquetDir(spark, dir, numFiles = 1)
    assert(pinned.count() == 60L,
      "a pre-compaction reader must keep materializing")
    val afterCompact = Dedup.snapshotFiles(spark, dir)
    assert(afterCompact.size == 1, s"compacted to one file: $afterCompact")
    assert(spark.read.parquet(afterCompact: _*).count() == 60L)
    // rewrite (the delete verb's shape) also versions
    Dedup.rewriteParquetDir(spark, dir, 1)(_.filter(col("id") < 10))
    assert(spark.read.parquet(Dedup.snapshotFiles(spark, dir): _*)
      .count() == 10L)
  }

  test("uncommitted segment files are invisible — crash between data " +
      "write and manifest commit loses nothing and breaks nothing") {
    val dir = tmp("graft-snap") + "/t"
    (0L until 20L).toDF("id").write.mode("overwrite").parquet(dir)
    SnapshotDir.enable(spark, dir)
    // simulate the crash: a segment written WITHOUT its manifest commit
    (100L until 110L).toDF("id")
      .write.mode("overwrite").parquet(s"$dir/seg-orphan")
    val seen = spark.read.parquet(Dedup.snapshotFiles(spark, dir): _*)
      .collect().map(_.getLong(0)).toSet
    assert(seen == (0L until 20L).toSet,
      "uncommitted segments must be invisible to readers")
    // and gc reclaims the orphan
    SnapshotDir.gc(spark, dir, keepVersions = 1)
    assert(!fs.exists(new Path(s"$dir/seg-orphan")),
      "gc must reclaim uncommitted segments")
    assert(spark.read.parquet(Dedup.snapshotFiles(spark, dir): _*)
      .count() == 20L)
  }

  test("gc keeps the newest versions and deletes expired files") {
    val dir = tmp("graft-snap") + "/t"
    (0L until 10L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    SnapshotDir.enable(spark, dir)
    Dedup.appendParquet((10L until 20L).toDF("id").coalesce(1), dir) // v2
    Dedup.compactParquetDir(spark, dir, 1)                           // v3
    // three manifests; the original root file + v2 segment are now only
    // referenced by expired versions
    SnapshotDir.gc(spark, dir, keepVersions = 1)
    val manifests = fs.listStatus(new Path(s"$dir/_manifests"))
      .map(_.getPath.getName).filter(_.endsWith(".list"))
    assert(manifests.length == 1, manifests.mkString(","))
    val files = Dedup.snapshotFiles(spark, dir)
    assert(files.size == 1)
    assert(spark.read.parquet(files: _*).count() == 20L)
    // nothing outside the kept version's segment remains on disk
    val rootParquet = fs.listStatus(new Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    assert(rootParquet.isEmpty, "expired root files must be reclaimed")
  }

  test("a versioned BM25 index probes identically through the whole " +
      "lifecycle, and its pinned reader survives the delete rewrite") {
    import graft.functions.{Retrieval, TextAnalysis}
    val corpus = Seq(
      (1L, "spark query engine runs a table scan over the table"),
      (2L, "the query planner rewrites every query against the table"),
      (3L, "storage formats and compression for columnar data"),
      (4L, "spark spark spark nothing else here")).toDF("doc_id", "text")
    val batch = Seq(
      (6L, "query the spark table twice"),
      (7L, "unrelated prose about forests")).toDF("doc_id", "text")
    val terms = Seq("table", "query", "spark")
    val dir = tmp("graft-snap-bm25")
    Retrieval.saveBm25Index(corpus, "doc_id", "text", dir)
    Retrieval.versionBm25Index(spark, dir)
    Retrieval.appendToBm25Index(batch, "doc_id", "text", dir)
    def probe() = Retrieval.bm25Probe(
      Retrieval.loadBm25Index(spark, dir), terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def direct(docs: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bm25(docs, "doc_id", "text", terms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe() == direct(corpus.unionByName(batch)))
    // pin a pre-delete index; delete + compact under it
    val pinnedIdx = Retrieval.loadBm25Index(spark, dir)
    Retrieval.deleteFromBm25Index(spark, dir,
      Seq(2L).toDF("doc_id"), numFiles = 1)
    Retrieval.compactBm25Index(spark, dir, numFiles = 1)
    assert(probe() == direct(corpus.unionByName(batch)
      .filter(col("doc_id") =!= 2L)))
    // the pinned snapshot still materializes its OWN version's rows
    assert(pinnedIdx.lens.count() == 6L,
      "a pinned pre-delete reader must survive the rewrites")
  }

  test("time travel: any committed version reads back exactly, until " +
      "gc expires it") {
    val dir = tmp("graft-snap") + "/t"
    (0L until 10L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    SnapshotDir.enable(spark, dir)                                  // v1
    Dedup.appendParquet((10L until 20L).toDF("id").coalesce(1), dir) // v2
    Dedup.rewriteParquetDir(spark, dir, 1)(_.filter(col("id") < 5)) // v3
    assert(SnapshotDir.versions(spark, dir) == Seq(1L, 2L, 3L))
    def readAt(v: Long) = spark.read
      .parquet(SnapshotDir.filesAt(spark, dir, v): _*)
      .collect().map(_.getLong(0)).toSet
    assert(readAt(1L) == (0L until 10L).toSet)
    assert(readAt(2L) == (0L until 20L).toSet)
    assert(readAt(3L) == (0L until 5L).toSet)
    SnapshotDir.gc(spark, dir, keepVersions = 2)
    assert(readAt(2L) == (0L until 20L).toSet,
      "a retained version must survive gc")
    val e = intercept[IllegalArgumentException] { readAt(1L) }
    assert(e.getMessage.contains("expired"), e.getMessage)
  }

  test("gc sweeps stale staged manifests left by a crashed commit") {
    val dir = tmp("graft-snap") + "/t"
    (0L until 5L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    SnapshotDir.enable(spark, dir)
    // a commit that died between temp-write and rename leaves this
    val stale = new Path(s"$dir/_manifests/.tmp-v000000000099-dead")
    fs.create(stale, true).close()
    // invisible to readers (the name pattern excludes it) …
    assert(spark.read.parquet(Dedup.snapshotFiles(spark, dir): _*)
      .count() == 5L)
    // … and reclaimed by gc, which nothing else would ever do
    SnapshotDir.gc(spark, dir, keepVersions = 1)
    assert(!fs.exists(stale), "gc must sweep stale .tmp-* manifests")
  }

  test("versioned-from-birth: empty v1 is append-first — a load before " +
      "the first append fails loudly by name, after it reads the batch") {
    val dir = tmp("graft-snap") + "/t"
    SnapshotDir.enable(spark, dir) // absent dir ⇒ empty v1
    val e = intercept[IllegalArgumentException] {
      Dedup.snapshotFiles(spark, dir)
    }
    assert(e.getMessage.contains("append"), e.getMessage)
    // TIME TRAVEL hits the same wall: a pinned empty v1 has no parquet
    // schema source, so filesAt names the append-first state too instead
    // of the opaque zero-path schema-inference error
    val te = intercept[IllegalArgumentException] {
      SnapshotDir.filesAt(spark, dir, 1L)
    }
    assert(te.getMessage.contains("append"), te.getMessage)
    Dedup.appendParquet((0L until 5L).toDF("id").coalesce(1), dir)
    assert(spark.read.parquet(Dedup.snapshotFiles(spark, dir): _*)
      .count() == 5L)
  }

  test("model registry: versioned model dirs give rollback — each save " +
      "commits a version, loadAt reproduces the old model exactly") {
    import graft.TestSpark.sf
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val dir = tmp("graft-kmm") + "/model"
    // v1: the day-0 model
    val m1 = Similarity.kmeansTrain(
      emb.filter(col("vec_id") < 100), "vec_id", "embedding",
      k = 4, sweeps = 2)
    Similarity.saveKmeansModel(spark, m1, dir)
    Similarity.versionKmeansModel(spark, dir)
    // v2: a retrain on different data REPLACES the model
    val m2 = Similarity.kmeansTrain(
      emb.filter(col("vec_id") >= 100), "vec_id", "embedding",
      k = 4, sweeps = 2)
    Similarity.saveKmeansModel(spark, m2, dir)
    assert(SnapshotDir.versions(spark, dir).size == 2)
    val v1 = SnapshotDir.versions(spark, dir).head
    assert(Similarity.loadKmeansModel(spark, dir).map(_.toSeq).toSeq ==
      m2.map(_.toSeq).toSeq, "latest load must be the retrain")
    assert(Similarity.loadKmeansModelAt(spark, dir, v1)
      .map(_.toSeq).toSeq == m1.map(_.toSeq).toSeq,
      "loadAt(v1) must reproduce the day-0 model bit-for-bit")
    // the NB twin: both tables travel in lockstep
    val docs = graft.Tables.load(spark, sf, "documents")
    val nbDir = tmp("graft-nbm") + "/model"
    val nb1 = TextAnalysis.nbTrain(
      docs.filter(col("doc_id") < 150), "source", "text")
    TextAnalysis.saveNbModel(nb1, nbDir)
    TextAnalysis.versionNbModel(spark, nbDir)
    TextAnalysis.saveNbModel(TextAnalysis.nbTrain(
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 300),
      "source", "text"), nbDir)
    val nv1 = SnapshotDir.versions(spark, s"$nbDir/priors").head
    val probe = docs.filter(col("doc_id") >= 300 && col("doc_id") < 320)
    val expected = TextAnalysis.nbClassify(
      probe, "doc_id", "text", nb1).orderBy("doc_id").collect().toSeq
    val replayed = TextAnalysis.nbClassify(probe, "doc_id", "text",
      TextAnalysis.loadNbModelAt(spark, nbDir, nv1))
      .orderBy("doc_id").collect().toSeq
    assert(replayed == expected,
      "classification under loadAt(v1) must equal the day-0 model's")
    // the CENTROID twin (round 16 — the last registry without a
    // rollback pin): train v1, retrain v2, classify under loadAt(v1)
    // must equal the day-0 model's output, latest load the retrain's
    val cDir = tmp("graft-cmm") + "/model"
    val c1 = Similarity.centroidTrain(
      emb.filter(col("vec_id") < 150), "embedding", "label")
    Similarity.saveCentroidModel(spark, c1, cDir)
    Similarity.versionCentroidModel(spark, cDir)
    val c2 = Similarity.centroidTrain(
      emb.filter(col("vec_id") >= 150 && col("vec_id") < 300),
      "embedding", "label")
    Similarity.saveCentroidModel(spark, c2, cDir)
    val cv1 = SnapshotDir.versions(spark, cDir).head
    val cProbe = emb.filter(col("vec_id") >= 300 && col("vec_id") < 330)
    def classify(m: Similarity.CentroidModel) =
      Similarity.centroidClassifyScored(
        cProbe, "vec_id", "embedding", m)
        .orderBy("vec_id").collect().toSeq
    assert(classify(Similarity.loadCentroidModelAt(spark, cDir, cv1))
      == classify(c1),
      "centroid classification under loadAt(v1) must equal day-0's")
    assert(classify(Similarity.loadCentroidModel(spark, cDir))
      == classify(c2),
      "latest centroid load must be the retrain")
  }

  test("gc retention is the one reader hazard: a DataFrame pinned to an " +
      "expired version fails on materialization — size keepVersions to " +
      "cover the longest reader") {
    val dir = tmp("graft-snap") + "/t"
    (0L until 10L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    SnapshotDir.enable(spark, dir)                                   // v1
    val pinnedV1 = spark.read.parquet(Dedup.snapshotFiles(spark, dir): _*)
    Dedup.rewriteParquetDir(spark, dir, 1)(_.filter(col("id") < 3)) // v2
    assert(pinnedV1.count() == 10L,
      "within retention the pinned reader still materializes")
    SnapshotDir.gc(spark, dir, keepVersions = 1)
    // past retention the pinned reader's files are gone — the failure is
    // a deterministic read error at materialization (the documented gc
    // contract), not silent partial data
    val e = intercept[Exception] { pinnedV1.count() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        String.valueOf(c.getMessage).contains("does not exist") ||
        String.valueOf(c.getMessage).contains("FILE_NOT_EXIST")),
      s"expected a file-not-found failure, got: $e")
    // time travel to the expired version names the expiry, not a crash
    val tt = intercept[IllegalArgumentException] {
      SnapshotDir.filesAt(spark, dir, 1L)
    }
    assert(tt.getMessage.contains("expired"), tt.getMessage)
  }

  test("every index family's version helper names the right tables: " +
      "versioned probe == plain probe after an append") {
    // each family: build twin indexes (plain + versioned), append the
    // same batch to both, probe both — identical results prove the
    // helper enabled the tables its appends actually write (a typo'd
    // subdir would leave the versioned twin missing the appended rows)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "eta theta iota kappa lambda mu")).toDF("doc_id", "text")
    val batch = Seq(
      (3L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")

    // MinHash
    val (mhP, mhV) = (tmp("sv-mh-p"), tmp("sv-mh-v"))
    for (d <- Seq(mhP, mhV))
      Dedup.saveMinhashIndex(
        Dedup.minhashIndex(docs, "doc_id", "text", 3, 16, 4), d)
    Dedup.versionMinhashIndex(spark, mhV)
    for (d <- Seq(mhP, mhV))
      Dedup.appendToMinhashIndex(spark, d, batch, "doc_id", "text")
    def mhProbe(d: String) = Dedup.incrementalMinhashDedup(
      Seq((9L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"),
      Dedup.loadMinhashIndex(spark, d), "doc_id", "text", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(mhProbe(mhV) == mhProbe(mhP))
    assert(SnapshotDir.isVersioned(spark, s"$mhV/sets") &&
      SnapshotDir.isVersioned(spark, s"$mhV/buckets"))

    // Hamming
    val hashes = Seq((1L, 0L), (2L, -1L)).toDF("doc_id", "h")
    val hBatch = Seq((3L, 3L)).toDF("doc_id", "h")
    val (hmP, hmV) = (tmp("sv-hm-p"), tmp("sv-hm-v"))
    for (d <- Seq(hmP, hmV))
      Dedup.saveHammingIndex(
        Dedup.hammingIndex(hashes, "doc_id", "h"), d)
    Dedup.versionHammingIndex(spark, hmV)
    for (d <- Seq(hmP, hmV))
      Dedup.appendToHammingIndex(spark, d, hBatch, "doc_id", "h")
    def hmProbe(d: String) = Dedup.incrementalHammingDedup(
      Seq((9L, 2L)).toDF("doc_id", "h"),
      Dedup.loadHammingIndex(spark, d), "doc_id", "h", maxDist = 2)
      .collect().map(_.getLong(0)).toSet
    assert(hmProbe(hmV) == hmProbe(hmP))

    // IVF
    val vecs = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "emb")
    val vBatch = Seq((3L, Seq(0.9f, 0.1f))).toDF("vec_id", "emb")
    val (ivP, ivV) = (tmp("sv-iv-p"), tmp("sv-iv-v"))
    for (d <- Seq(ivP, ivV))
      Similarity.saveIvfIndex(
        Similarity.ivfIndex(vecs, "vec_id", "emb", nCells = 2), d)
    Similarity.versionIvfIndex(spark, ivV)
    for (d <- Seq(ivP, ivV))
      Similarity.appendToIvfIndex(spark, d, vBatch, "vec_id", "emb")
    def ivProbe(d: String) = Similarity.incrementalSemDedup(
      Seq((9L, Seq(0.95f, 0.05f))).toDF("vec_id", "emb"),
      Similarity.loadIvfIndex(spark, d), "vec_id", "emb",
      threshold = 0.9, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(ivProbe(ivV) == ivProbe(ivP))
  }
}
