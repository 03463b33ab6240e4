package graft.ext

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent trained-index catalog (VERDICT r15 #2): the index
  * lifecycle a 100 TB deployment actually runs. Training an IVF coarse
  * quantizer or a PQ codebook is a full pass over the corpus; serving a
  * query needs only the tiny trained artifact (kCells × 64 doubles, or
  * subspaces × nCentroids subvectors). Through r15 every trained-index
  * query retrained per invocation — correct, but the wrong lifecycle:
  * a production vector store trains ONCE, persists the artifact next
  * to a manifest, and every serving read loads it.
  *
  * Layout (TickStore-style directory table):
  * {{{
  * <root>/<kind>-<params>-<hash16>/
  *   artifact/   # the trained table (centroids: cid, cemb;
  *               #   codebooks: s, cid, cv) — one small parquet file
  *   manifest/   # one-row parquet: kind, params, dims, n_vectors,
  *               #   corpus fingerprint, semantics hash
  * }}}
  *
  * Key identity = md5(corpus fingerprint ‖ training-semantics text).
  *  - The CORPUS fingerprint is (canonical path, size, mtime) of every
  *    input file — a regenerated or different corpus changes the key
  *    and the artifact retrains; no stale index ever serves.
  *  - The SEMANTICS text is the training op's own DuckDB twin SQL:
  *    the twin spells out the complete training algorithm (seeds,
  *    quantized means, carry-forward, tie-breaks), so ANY change to
  *    the training math changes the twin, changes the key, and
  *    invalidates the artifact — the catalog can never serve
  *    centroids a bit different from what retraining would produce,
  *    which is exactly the invariant that keeps the retraining DuckDB
  *    oracles of q_kmeans / q_ivf_trained_topk green against a
  *    catalog-loading Spark side.
  *
  * Training is bit-deterministic (integer-quantized Lloyd means,
  * (dist, cid) tie-breaks) and parquet round-trips doubles exactly, so
  * load ≡ retrain bit-for-bit; IndexCatalogSpec pins the roundtrip and
  * the invalidation rules. Writes are atomic: stage to a temp sibling,
  * one directory rename; a concurrent trainer that loses the race
  * discards its stage and loads the winner.
  *
  * In-memory corpora (unit-test DataFrames with no file lineage) have
  * no stable fingerprint — they train inline and nothing persists. */
object IndexCatalog {

  /** Bump ONLY if artifact layout changes in a way the semantics-text
    * key cannot see (e.g. a different parquet schema for the same
    * training math). */
  private val LayoutVersion = 1

  def root: String = sys.props.getOrElse("graft.index.catalog.root",
    s"${System.getProperty("java.io.tmpdir")}/graft-index-catalog")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (canonical path, size, mtime) of each corpus file — the
    * shared fingerprint both the Spark side (from `df.inputFiles`)
    * and the oracle-SQL builder (from the sf dir) compute. */
  private[graft] def fileFingerprint(paths: Seq[String]): String =
    paths.map { p =>
      val f = new java.io.File(p).getCanonicalFile
      s"${f.getPath}:${f.length}:${f.lastModified}"
    }.sorted.mkString("|")

  /** Fingerprint of a DataFrame's file lineage; None for in-memory
    * corpora (no stable identity — train inline, never persist). */
  private[graft] def corpusFingerprint(df: DataFrame): Option[String] = {
    val files = df.inputFiles.toSeq
    if (files.isEmpty) None
    else Some(fileFingerprint(files.map(f =>
      if (f.startsWith("file:")) new java.net.URI(f).getPath else f)))
  }

  private[graft] def keyOf(kind: String, params: String, fp: String,
      semantics: String): String =
    s"$kind-$params-" +
      md5hex(s"v$LayoutVersion $fp $semantics").take(16)

  /** Absolute artifact directory for a catalog key — the path the
    * DuckDB twins read with read_parquet. */
  def artifactDir(key: String): String = s"$root/$key/artifact"
  def manifestDir(key: String): String = s"$root/$key/manifest"

  /** The key the ORACLE side computes for the standard embeddings
    * corpus of an sf dir — must equal the Spark side's key for the
    * same dir, which IndexCatalogSpec pins. */
  private[graft] def keyForDir(sfDir: String, kind: String,
      params: String, semantics: String): String =
    keyOf(kind, params,
      fileFingerprint(Seq(s"$sfDir/embeddings.parquet")), semantics)

  /** One load per (session, key): the loaded artifact is tiny and
    * checkpointed; sessions differ across suites so the memo keys on
    * the application id. */
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    String, DataFrame]()

  /** Load-or-train-and-persist. `train` produces the artifact table;
    * the result always comes back FROM DISK (except for in-memory
    * corpora), so the serving plan is the loaded-artifact plan and
    * every query exercises the roundtrip. */
  private def loadOrTrain(embeddings: DataFrame, kind: String,
      params: String, semantics: String,
      train: () => DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    corpusFingerprint(embeddings) match {
      case None => train().transform(graft.functions.checkpointed)
      case Some(fp) =>
        val key = keyOf(kind, params, fp, semantics)
        memo.computeIfAbsent(
          spark.sparkContext.applicationId + ":" + key, { _ =>
            if (!Files.isDirectory(Paths.get(manifestDir(key))))
              persist(embeddings, key, kind, params, fp, semantics,
                train())
            spark.read.parquet(artifactDir(key))
              .transform(graft.functions.checkpointed)
          })
    }
  }

  /** Stage artifact + manifest, then one atomic directory rename into
    * the catalog; losing a concurrent race just discards the stage. */
  private def persist(embeddings: DataFrame, key: String, kind: String,
      params: String, fp: String, semantics: String,
      trained: DataFrame): Unit = {
    val spark = embeddings.sparkSession
    Files.createDirectories(Paths.get(root))
    val stage = Files.createTempDirectory(Paths.get(root), s".stage-$key-")
    try {
      trained.coalesce(1).write.mode("overwrite")
        .parquet(s"$stage/artifact")
      val nVectors = corpusFingerprint(embeddings).map(_ =>
        embeddings.inputFiles.toSeq.map(f =>
          graft.Tables.parquetRowCount(
            if (f.startsWith("file:")) new java.net.URI(f).getPath
            else f)).sum).getOrElse(-1L)
      import spark.implicits._
      Seq((kind, params, Similarity.Dims.toLong, nVectors, fp,
        md5hex(semantics)))
        .toDF("kind", "params", "dims", "n_vectors",
          "corpus_fingerprint", "semantics_md5")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$stage/manifest")
      val dst = Paths.get(s"$root/$key")
      try Files.move(stage, dst, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException |
                   _: java.nio.file.FileSystemException
          if Files.isDirectory(Paths.get(manifestDir(key))) => ()
      }
    } finally {
      if (Files.isDirectory(stage)) deleteRecursively(stage)
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
  }

  // ------------------------------------------------------- artifacts

  /** Trained k-means centroids (cid, cemb) — the IVF coarse quantizer
    * shared by ivfTrainedTopK / twoNNIndexed / ivfPqTrainedTopK /
    * kmeansCentroids at the same (k, iters). */
  def centroids(embeddings: DataFrame, k: Int, iters: Int): DataFrame =
    loadOrTrain(embeddings, "kmeans", s"k$k-i$iters",
      Similarity.kmeansSemantics(k, iters),
      () => Similarity.kmeansLoop(embeddings, k, iters)._2)

  /** Trained PQ codebook (s, cid, cv) over raw subvector slices. */
  def pqCodebook(embeddings: DataFrame, subspaces: Int, nCentroids: Int,
      iters: Int): DataFrame =
    loadOrTrain(embeddings, "pq", s"s$subspaces-c$nCentroids-i$iters",
      Similarity.pqSemantics(subspaces, nCentroids, iters),
      () => Similarity.trainPqCodebook(embeddings, subspaces,
        nCentroids, iters))

  /** Trained residual PQ codebook (s, cid, cv): subvector codebooks
    * over CELL residuals against the (catalog-shared) coarse
    * centroids. */
  def residualCodebook(embeddings: DataFrame, subspaces: Int,
      nCentroids: Int, nCells: Int, cellIters: Int,
      pqIters: Int): DataFrame =
    loadOrTrain(embeddings, "ivfpq-residual",
      s"s$subspaces-c$nCentroids-k$nCells-ci$cellIters-pi$pqIters",
      Similarity.ivfPqSemantics(subspaces, nCentroids, nCells,
        cellIters, pqIters),
      () => Similarity.trainResidualCodebook(embeddings, subspaces,
        nCentroids, nCells, cellIters, pqIters))

  /** The persisted MinHash signature index of an existing corpus
    * (doc_id < splitId of a documents table): per-doc k-permutation
    * signature plus the Jaccard verification payload (shingle count +
    * shingle set) — the table [[Dedup.deltaNearDup]] dedups every
    * future shard against without recomputing corpus signatures. The
    * split id rides in the params (the corpus FILE fingerprint alone
    * cannot see it); the semantics text is the signature twin SQL. */
  def minhashSignatures(corpusDocs: DataFrame, splitId: Long, n: Int,
      k: Int): DataFrame =
    loadOrTrain(corpusDocs, "minhash-sig", s"split$splitId-n$n-k$k",
      Dedup.minhashSigSemantics(n, k),
      () => Dedup.minhashPerDoc(corpusDocs, n, k))

  /** The signature-index key for the standard documents corpus of an
    * sf dir (spec support). */
  private[graft] def keyForDirDocs(sfDir: String, splitId: Long,
      n: Int, k: Int): String =
    keyOf("minhash-sig", s"split$splitId-n$n-k$k",
      fileFingerprint(Seq(s"$sfDir/documents.parquet")),
      Dedup.minhashSigSemantics(n, k))

  /** Trained quality-classifier weights (bias, w1..w4) over a
    * documents corpus — the 5-double model artifact of
    * [[TextOps.trainQualityClassifier]], persisted as a (j, w) table
    * keyed by the documents fingerprint + the classifier twin SQL
    * (24 unrolled gradient CTEs — any training-math change changes
    * the text and retrains). */
  def classifierWeights(docs: DataFrame, iters: Int,
      eta: Double): Array[Double] = {
    val spark = docs.sparkSession
    val wdf = loadOrTrain(docs, "quality-classifier",
      s"i$iters-e$eta", TextOps.qualityClassifierSql(iters, eta),
      () => {
        import spark.implicits._
        TextOps.trainQualityClassifierInline(docs, iters, eta)
          .zipWithIndex.map { case (wj, j) => (j.toLong, wj) }.toSeq
          .toDF("j", "w")
      })
    wdf.orderBy("j").collect().map(_.getAs[Double]("w"))
  }

  /** The catalog listing for an embeddings corpus — every artifact
    * kind the engine serves from, ensured trained, manifests read
    * back FROM DISK joined with a live-corpus freshness check (the
    * audit a serving tier runs before trusting an index). In-memory
    * corpora have no catalog — one synthetic `untracked` row. */
  def manifests(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    corpusFingerprint(embeddings) match {
      case None =>
        Seq(("untracked", "", Similarity.Dims.toLong, -1L, false))
          .toDF("kind", "params", "dims", "n_vectors", "fresh")
      case Some(fp) =>
        // ensure the three serving artifacts exist, then read the
        // manifests from disk (the load path IS the product)
        ensure(embeddings)
        val keys = manifestKeys(fp)
        val live = embeddings.inputFiles.toSeq.map(f =>
          graft.Tables.parquetRowCount(
            if (f.startsWith("file:")) new java.net.URI(f).getPath
            else f)).sum
        keys.map(k => spark.read.parquet(manifestDir(k)))
          .reduce(_.unionByName(_))
          .select(col("kind"), col("params"), col("dims"),
            col("n_vectors"), (col("n_vectors") === live).as("fresh"))
          .orderBy("kind", "params")
    }
  }

  /** Train-or-load every standard serving artifact for a corpus —
    * the pre-flight a consumer of the catalog twins runs when it
    * replays oracle SQL without having run the serving queries first
    * (OracleBudgetSpec). */
  def ensure(embeddings: DataFrame): Unit = {
    centroids(embeddings, 8, 2)
    pqCodebook(embeddings, 8, 16, 2)
    residualCodebook(embeddings, 8, 16, 8, 2, 2)
    ()
  }

  /** The three standard serving-artifact keys for a corpus
    * fingerprint — shared by [[manifests]] and the oracle twin. */
  private[graft] def manifestKeys(fp: String): Seq[String] = Seq(
    keyOf("kmeans", "k8-i2", fp, Similarity.kmeansSemantics(8, 2)),
    keyOf("pq", "s8-c16-i2", fp, Similarity.pqSemantics(8, 16, 2)),
    keyOf("ivfpq-residual", "s8-c16-k8-ci2-pi2", fp,
      Similarity.ivfPqSemantics(8, 16, 8, 2, 2)))

  /** DuckDB twin of [[manifests]] for the standard embeddings corpus
    * of `sfDir` — reads the SAME persisted manifest files. */
  def manifestsSql(sfDir: String): String = {
    val fp = fileFingerprint(Seq(s"$sfDir/embeddings.parquet"))
    val reads = manifestKeys(fp).map(k =>
      s"SELECT kind, params, dims, n_vectors FROM " +
        s"read_parquet('${manifestDir(k)}/*.parquet')")
      .mkString(" UNION ALL ")
    s"""SELECT kind, params, dims, n_vectors,
       | n_vectors = (SELECT count(*) FROM embeddings) AS fresh
       |FROM ($reads) ORDER BY kind, params""".stripMargin
      .replace('\n', ' ')
  }
}
