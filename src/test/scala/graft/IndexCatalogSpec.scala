package graft

import graft.ext.{IndexCatalog, Similarity}

/** Trained-index catalog gates (VERDICT r15 #2): persisted artifact ≡
  * retrained bit-for-bit, key parity between the Spark side and the
  * oracle builder, key invalidation on corpus/semantics change, and
  * the in-memory fallback that keeps unit-test corpora out of the
  * persistent store. */
class IndexCatalogSpec extends SparkSpec {

  private def embs = Tables.table(spark, sf(), "embeddings")

  private def bits(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("cid").collect().map { r =>
      val cid = r.getLong(r.fieldIndex("cid"))
      val arr = r.getSeq[Double](r.fieldIndex("cemb"))
        .map(java.lang.Double.doubleToRawLongBits).mkString(",")
      s"$cid:$arr"
    }.toSeq

  test("catalog key parity: the Spark-side fingerprint (df.inputFiles) " +
      "equals the oracle builder's (sfDir) — the twins read the file " +
      "the engine wrote") {
    val fp = IndexCatalog.corpusFingerprint(embs)
    assert(fp.isDefined, "parquet-backed corpus must fingerprint")
    assert(IndexCatalog.keyOf("kmeans", "k8-i2", fp.get, "sem") ===
      IndexCatalog.keyForDir(sf(), "kmeans", "k8-i2", "sem"),
      "oracle-side key diverges from the Spark-side key — the twins " +
        "would read a different artifact than the engine serves")
  }

  test("persisted centroids load back bit-identical to a fresh " +
      "training run (the invariant that keeps retraining oracles " +
      "green against a catalog-loading engine)") {
    val loaded = IndexCatalog.centroids(embs, 8, 2)
    val retrained = Similarity.kmeansLoop(embs, 8, 2)._2
    assert(bits(loaded) === bits(retrained),
      "catalog roundtrip perturbed a centroid bit")
    // and the artifact really is ON DISK under the computed key
    val key = IndexCatalog.keyForDir(sf(), "kmeans", "k8-i2",
      Similarity.kmeansSemantics(8, 2))
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(IndexCatalog.artifactDir(key))),
      s"no artifact at ${IndexCatalog.artifactDir(key)}")
  }

  test("manifest audit: every standard artifact reports dims, the " +
      "live corpus size, and fresh=true") {
    val rows = IndexCatalog.manifests(embs).collect()
    assert(rows.map(_.getAs[String]("kind")).sorted ===
      Seq("ivfpq-residual", "kmeans", "pq"))
    val n = Tables.parquetRowCount(s"${sf()}/embeddings.parquet")
    rows.foreach { r =>
      assert(r.getAs[Long]("dims") === 64L)
      assert(r.getAs[Long]("n_vectors") === n,
        s"${r.getAs[String]("kind")} manifest corpus-size drift")
      assert(r.getAs[Boolean]("fresh"),
        s"${r.getAs[String]("kind")} artifact reported stale " +
          "against its own corpus")
    }
  }

  test("key invalidation: a different training semantics or a " +
      "different corpus fingerprint yields a different key — stale " +
      "artifacts can never serve") {
    val fp = IndexCatalog.corpusFingerprint(embs).get
    val k0 = IndexCatalog.keyOf("kmeans", "k8-i2", fp, "algo v1")
    assert(k0 !== IndexCatalog.keyOf("kmeans", "k8-i2", fp, "algo v2"),
      "semantics change did not invalidate")
    assert(k0 !== IndexCatalog.keyOf("kmeans", "k8-i2",
      fp + ":touched", "algo v1"),
      "corpus change did not invalidate")
  }

  test("in-memory corpora train inline and never persist — unit-test " +
      "DataFrames do not pollute the catalog") {
    val rows = (0L until 16L).map(i =>
      (i, Array.tabulate(64)(d => (i * 64 + d).toFloat / 1000f)))
    val mem = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    assert(IndexCatalog.corpusFingerprint(mem).isEmpty)
    val rootDir = new java.io.File(IndexCatalog.root)
    val before = Option(rootDir.list()).map(_.toSet).getOrElse(Set())
    val cents = IndexCatalog.centroids(mem, 4, 1)
    assert(cents.count() === 4L)
    val after = Option(rootDir.list()).map(_.toSet).getOrElse(Set())
    assert(after === before, "in-memory training wrote to the catalog")
  }

  test("quality-classifier weights: catalog load equals an inline " +
      "retrain bit-for-bit (the 5-double model artifact)") {
    val docs = Tables.table(spark, sf(), "documents")
    val loaded = IndexCatalog.classifierWeights(docs, 24, 1.0)
    val fresh = graft.ext.TextOps
      .trainQualityClassifierInline(docs, 24, 1.0)
    assert(loaded.length === 5)
    assert(loaded.map(java.lang.Double.doubleToRawLongBits).toSeq ===
      fresh.map(java.lang.Double.doubleToRawLongBits).toSeq,
      "classifier weight roundtrip perturbed a bit")
  }

  test("delta dedup off the persisted signature index equals the " +
      "crossing subset of a full recompute (incremental-ingestion " +
      "correctness)") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.table(spark, sf(), "documents")
    val split = Tables.parquetRowCount(s"${sf()}/documents.parquet") / 2
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => r.toSeq.map(_.toString).mkString("|"))
        .sorted.toSeq
    // a full-corpus near-dup pass restricted to pairs that CROSS the
    // split is exactly what the delta pass must find: same banding,
    // same verification, corpus side served from the persisted index
    val full = graft.ext.Dedup.minhashNearDup(docs)
      .where(col("doc_a") < split && col("doc_b") >= split)
      .select(col("doc_b").as("doc_new"),
        col("doc_a").as("doc_corpus"),
        col("inter"), col("uni"), col("jaccard"))
    val delta = graft.ext.Dedup.deltaNearDup(docs, split)
    assert(rows(delta) === rows(full),
      "persisted-index delta dedup diverges from the full recompute")
    // and the artifact is really on disk under the computed key
    val key = IndexCatalog.keyForDirDocs(sf(), split, 2, 16)
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(IndexCatalog.artifactDir(key))),
      s"no signature index at ${IndexCatalog.artifactDir(key)}")
  }

  test("catalog serving reads equal the retrained serving reads " +
      "across the whole trained family (ivf / pq / ivfpq / twoNN)") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => r.toSeq.map(v =>
        if (v == null) "null" else v.toString).mkString("|")).toSeq
    // the serving entry points now LOAD from the catalog; their
    // outputs must be exactly what the r15 retraining plans produced
    // (the oracle gates pin this against DuckDB too — this is the
    // fast in-engine tripwire)
    val ivf = Similarity.ivfTrainedTopK(embs).orderBy("q_id", "rank")
    assert(rows(ivf).nonEmpty)
    val pq = Similarity.pqTrainedCodes(embs).orderBy("vec_id")
    assert(rows(pq).nonEmpty)
    val ivfpq = Similarity.ivfPqTrainedTopK(embs)
      .orderBy("q_id", "rank")
    assert(rows(ivfpq).nonEmpty)
    // cross-check one family member end-to-end against an explicitly
    // retrained serve (no catalog): fresh cents fed to the shared
    // serving chain must equal the catalog-loaded serve bit-for-bit
    val fresh = Similarity.kmeansLoop(embs, 8, 2)._2
    assert(rows(Similarity.ivfServeFrom(embs, fresh, 2, 10, 3)
      .orderBy("q_id", "rank")) === rows(ivf),
      "catalog-loaded IVF serve diverged from retrained serve")
  }
}
