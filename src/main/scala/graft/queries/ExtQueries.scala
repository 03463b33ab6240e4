package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext._

/** Correctness-gate entries for the training-data-pipeline extensions
  * (builder brief): dedup, similarity search, text analysis, multimodal
  * plumbing. All oracle-backed and bit-exact. */
object ExtQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.table(s, dir, "documents")
  private def embs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.table(s, dir, "embeddings")

  // Spread variants for the CPU-heavy operators (optimization guide
  // §2.5, input skew): both corpora arrive as ONE parquet row group at
  // every driver SF, so the raw scan is one task and every narrow
  // stage between the scan and the first exchange — shingling every
  // n-gram, Levenshtein verify prep, BPE segmentation, JPEG/AVI
  // decode, 64-dim dot products — runs on one core. spreadBy
  // hash-repartitions on the unique key ONLY when the scan is
  // under-split relative to the session cores (a no-op branch at
  // production layouts). Opt-in per call site, not the loader default:
  // measured at sf0.1/local[32], shingle/codec/ANN operators gain
  // 15-55% while map-side-cheap operators (pack/mixture/len_hist) pay
  // the extra exchange (+0.1-0.4 s) and the LM-scoring chain loses
  // ~0.5 s — those keep the raw scan.
  private def docsS(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.spreadBy(docs(s, dir), "doc_id")
  private def embsS(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.spreadBy(embs(s, dir), "vec_id")

  /** Corpus size from the parquet footer — drives the DATA-DEPENDENT ANN
    * parameters (LSH plane count, IVF centroid count) so the gates exercise
    * the scale dials instead of toy-pinned defaults (VERDICT r4 #3). The
    * Spark side derives it from the dir each query fn receives; the oracle
    * side (no dir in the contract) from [[Tables.oracleSfDir]], which
    * Verify sets to the same dir before the registry is built. */
  private def embCount(dir: String): Long =
    Tables.parquetRowCount(s"$dir/embeddings.parquet")
  private def oracleEmbCount: Long = embCount(Tables.oracleSfDir.get)
  private def docCount(dir: String): Long =
    Tables.parquetRowCount(s"$dir/documents.parquet")
  private def oracleDocCount: Long = docCount(Tables.oracleSfDir.get)

  /** Shared minhash near-dup pair graph: dedupGroups / dedupApply /
    * dedupGroupSizes all consume the SAME verified pair set, and each
    * registry invocation used to rebuild the full shingle→minhash→band
    * chain from scratch (~11.6 s of the r5 bench across the three
    * entries — VERDICT r5 watch-list). Memoized per (session, dir) with
    * an eager localCheckpoint (plan-owned blocks, GC with the plan);
    * `q_minhash_neardup` itself stays unmemoized so the bench keeps
    * measuring the real construction cost once. */
  private val pairsMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()
  private def pairsFor(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    pairsMemo.computeIfAbsent(
      System.identityHashCode(s).toString + ":" + dir,
      _ => Dedup.minhashNearDupFrom(perDocFor(s, dir))
        .select("doc_a", "doc_b")
        .transform(graft.functions.checkpointed))

  /** Shared checkpointed per-doc MinHash signature table (signature +
    * verification payload): the pair graph ([[pairsFor]]) and the
    * edit-distance verifier's banded candidates consume the SAME
    * signature build (VERDICT r16 #4 — `q_editdist_neardup` used to
    * re-shingle the corpus to regenerate candidates the minhash chain
    * had already computed). Memoized per (session, dir) like
    * [[pairsFor]]; `q_minhash_neardup` itself stays on its own
    * unmemoized build so the bench keeps measuring the full
    * construction cost once per sweep. */
  private val perDocMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()
  private def perDocFor(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    perDocMemo.computeIfAbsent(
      System.identityHashCode(s).toString + ":" + dir,
      _ => Dedup.minhashPerDoc(docsS(s, dir), 2, 16)
        .transform(graft.functions.checkpointed))

  /** Shared checkpointed LM-scored corpus — `(doc_id, n_bigrams,
    * avg_logprob, lang)`, the bigram-LM quality scores every CCNet-style
    * consumer reads (VERDICT r16 #6): `q_bigram_logprob` returns it,
    * `q_ppl_buckets` terciles it, `q_ppl_bounds` runs the distributed
    * boundary plan over it. One training+scoring pass per (session,
    * dir) — the production shape: one LM, one score table, several
    * curation consumers — instead of three end-to-end retrains. */
  private val lmScoredMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()
  private def lmScoredFor(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    lmScoredMemo.computeIfAbsent(
      System.identityHashCode(s).toString + ":" + dir,
      _ => TextOps.bigramLogProb(docs(s, dir))
        .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
        .transform(graft.functions.checkpointed))

  /** Shared k-means cell assignment: `q_semdedup` and `q_cell_balance`
    * both consume the SAME trained clustering (the production shape — a
    * curation stack runs dedup + balance + audit off one model), so the
    * registry trains it once per (session, dir) — the [[pairsFor]]
    * memo one family over. Since r16 the underlying centroids also
    * come from the persistent [[graft.ext.IndexCatalog]]: the FIRST
    * run on a corpus pays training and persists the artifact; every
    * later run (including every later bench sweep) loads it — the
    * serve-from-trained-artifact lifecycle the bench now measures. */
  private val cellsMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()
  private def cellAssignmentFor(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    cellsMemo.computeIfAbsent(
      System.identityHashCode(s).toString + ":" + dir,
      _ => Similarity.cellAssignment(embsS(s, dir),
        Similarity.semCellsFor(embCount(dir)), iters = 2))

  /** Shared trained+scored classifier table: `q_quality_classifier` and
    * `q_classifier_calibration` read the SAME 24-iteration training run
    * (one model, score table + calibration audit off it — the served-ML
    * production shape), memoized per (session, dir) like [[pairsFor]].
    * The scored table is checkpointed so the calibration aggregate
    * never re-trains. */
  private val clsMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()
  private def classifierScoredFor(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    clsMemo.computeIfAbsent(
      System.identityHashCode(s).toString + ":" + dir,
      _ => TextOps.qualityClassifier(docsS(s, dir)).transform(graft.functions.checkpointed))

  /** Query bag for the BM25 gate — mid-frequency vocabulary words so df
    * spreads across terms. */
  private val BM25Terms = Seq("spark", "merge", "join", "hash")

  /** Per-language keep rates for the stratified-sampling gate: halve the
    * dominant language, keep a third of mid-size strata. */
  private val SampleRates = Seq("en" -> 0.5, "zh" -> 0.3)

  /** Mixture weights for the epoch-sampling gate: upsample src0 past one
    * epoch (2.5×), downweight src1, default single epoch elsewhere. */
  private val MixtureWeights = Seq("src0" -> 2.5, "src1" -> 0.4)

  // Memoized PER oracleSfDir (not a val: the ANN/curation oracle strings
  // depend on Tables.oracleSfDir, which Verify sets at startup — a val
  // could freeze SQL built against the wrong dir if the object
  // initializes first; not a bare def: every registry access would
  // re-read parquet footers and regenerate the large k-means/PQ/BPE CTE
  // strings — Bench touches the registry per sweep and needs it I/O-free).
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Q]]()
  def all: Seq[Q] =
    memo.computeIfAbsent(Tables.oracleSfDir.get, _ => build())

  /** The ext registry partitioned into bench families (VERDICT r6 #7):
    * `build()` lists queries in family blocks, and each entry here names
    * a block's FIRST query — the slice boundaries. A spec gates that the
    * families exactly partition `all`, so reordering build() without
    * updating a boundary fails fast instead of mis-tagging silently. */
  private val familyStarts = Seq(
    "dedup" -> "q_dedup_exact",
    "ann" -> "q_cosine_neardup",
    "text" -> "q_token_count",
    "pipeline" -> "q_pack_sequences",
    "multimodal" -> "q_multimodal_meta")

  def families: Seq[(String, Seq[Q])] = {
    val qs = all
    val starts = familyStarts.map { case (f, n) =>
      val i = qs.indexWhere(_.name == n)
      require(i >= 0, s"family boundary $n missing from registry")
      f -> i
    }
    require(starts.head._2 == 0, "first family must start the registry")
    require(starts.map(_._2) == starts.map(_._2).sorted,
      "family boundaries out of registry order")
    val ends = starts.tail.map(_._2) :+ qs.length
    starts.zip(ends).map { case ((f, from), until) =>
      f -> qs.slice(from, until)
    }
  }

  private def build(): Seq[Q] = Seq(

    // exact dedup: hash groupBy
    Q("q_dedup_exact",
      (s, dir) => Dedup.exactDedup(docs(s, dir)).orderBy("text_hash"),
      Some(Dedup.exactDedupSql)),

    // MinHash + LSH near-dup candidates, exact-Jaccard verified
    Q("q_minhash_neardup",
      (s, dir) => Dedup.minhashNearDup(docsS(s, dir))
        .orderBy("doc_a", "doc_b"),
      Some(Dedup.minhashNearDupSql())),

    // near-dup clustering: connected components over the verified minhash
    // pair graph + canonical-doc selection (the dedup-apply step)
    Q("q_dedup_groups",
      (s, dir) => Dedup.dedupGroups(docs(s, dir), pairsFor(s, dir))
        .orderBy("doc_id"),
      Some(Dedup.dedupGroupsSql())),

    // dedup APPLY: surviving corpus after dropping non-canonical members
    // of each near-dup group — the end-to-end loop from pair detection to
    // the corpus a trainer reads
    Q("q_dedup_apply",
      (s, dir) => Dedup.dedupApply(docs(s, dir), pairsFor(s, dir))
        .orderBy("doc_id"),
      Some(Dedup.dedupApplySql())),

    // SimHash fingerprints
    Q("q_simhash",
      (s, dir) => Dedup.simhash(docsS(s, dir)).orderBy("doc_id"),
      Some(Dedup.simhashSql)),

    // SimHash near-dup pairs (64-bit hash, band width scales with corpus
    // size via bandBitsFor — 4-bit bands at n=500, 8-bit at n=2000 — so
    // the band self-join stays occupancy-bounded at any SF)
    Q("q_simhash_neardup",
      (s, dir) => Dedup.simhashNearDup(docsS(s, dir),
          Dedup.bandBitsFor(docCount(dir)))
        .orderBy("doc_a", "doc_b"),
      Some(Dedup.simhashNearDupSql(Dedup.bandBitsFor(oracleDocCount)))),

    // dedup-group size histogram (the duplication audit view)
    Q("q_dedup_sizes",
      (s, dir) => Dedup.dedupGroupSizes(docs(s, dir), pairsFor(s, dir))
        .orderBy("group_size"),
      Some(Dedup.dedupGroupSizesSql())),

    // rolling document fingerprint (md5-60bit)
    Q("q_fingerprint",
      (s, dir) => Dedup.fingerprint(docs(s, dir)).orderBy("doc_id"),
      Some(Dedup.fingerprintSql)),

    // winnowing fingerprints (MOSS rolling-hash window minima)
    Q("q_winnow_fingerprint",
      (s, dir) => Dedup.winnowFingerprints(docsS(s, dir))
        .orderBy("doc_id", "fingerprint"),
      Some(Dedup.winnowFingerprintsSql())),

    // edit-distance near-dup: the SAME banded-LSH candidates as minhash,
    // verified by normalized Levenshtein instead of set overlap
    Q("q_editdist_neardup",
      (s, dir) => Dedup.editDistNearDupFrom(perDocFor(s, dir),
          docsS(s, dir))
        .orderBy("doc_a", "doc_b"),
      Some(Dedup.editDistNearDupSql())),

    // incremental (delta) dedup: the second half of the corpus dedups
    // against the FIRST half's PERSISTED signature index (the
    // IndexCatalog minhash-sig artifact — the ingestion-pipeline
    // workflow: new shard vs existing corpus, no corpus recompute).
    // The twin recomputes BOTH sides from raw documents, so the gate
    // proves persisted-index serving ≡ recomputation bit-for-bit.
    Q("q_delta_dedup",
      (s, dir) => Dedup.deltaNearDup(docsS(s, dir), docCount(dir) / 2)
        .orderBy("doc_new", "doc_corpus"),
      Some(Dedup.deltaNearDupSql(oracleDocCount / 2))),

    // n-gram Jaccard near-dup over rare-shingle-blocked pairs. The
    // default dial (dfMax=5) is nearly degenerate on the synthetic
    // corpus (1 pair at sf0.01) — kept as the tight-blocking
    // regression case; the _wide gate below runs the dial where the
    // verified pair set is non-trivial at BOTH SFs (VERDICT r9 #6:
    // 51 pairs at sf0.01, 15 at sf0.1, candidates still bounded by
    // dfMax per shingle key).
    Q("q_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccard(docs(s, dir))
        .orderBy("doc_a", "doc_b"),
      Some(Dedup.ngramJaccardSql())),
    Q("q_ngram_jaccard_wide",
      (s, dir) => Dedup.ngramJaccard(docs(s, dir), dfMax = 20)
        .orderBy("doc_a", "doc_b"),
      Some(Dedup.ngramJaccardSql(dfMax = 20))),

    // shingle containment: the subset/quote detector symmetric
    // Jaccard misses — |A∩B|/min(|A|,|B|) with the contained side
    // named; low threshold so the gate pair set is non-trivial
    Q("q_ngram_containment",
      (s, dir) => Dedup.ngramContainment(docs(s, dir),
        threshold = 0.2),
      Some(Dedup.ngramContainmentSql(threshold = 0.2))),

    // keeper-policy variant over near-dup groups: keep the LONGEST
    // member (most complete mirror survives), composite integer argmax
    Q("q_dedup_keep_longest",
      (s, dir) => Dedup.dedupGroupsKeepLongest(docs(s, dir),
          pairsFor(s, dir)).orderBy("doc_id"),
      Some(Dedup.dedupGroupsKeepLongestSql())),

    // mirror-detection matrix: verified near-dup pairs rolled up to
    // canonical (source_a <= source_b) with the memoized pair list
    Q("q_dup_source_matrix",
      (s, dir) => Dedup.dupSourceMatrix(pairsFor(s, dir), docs(s, dir))
        .orderBy("source_a", "source_b"),
      Some(Dedup.dupSourceMatrixSql())),

    // hybrid near-dup: minhash-banded lexical candidates verified by
    // embedding cosine (two-stage recall/precision split); demo
    // threshold — the synthetic embeddings are text-independent
    Q("q_hybrid_neardup",
      (s, dir) => Dedup.hybridNearDup(docsS(s, dir), embsS(s, dir))
        .orderBy("doc_a", "doc_b"),
      Some(Dedup.hybridNearDupSql())),

    // blocking-strategy agreement: LSH vs df-bounded postings pair sets
    // at the same verify threshold — mutual coverage, the dial audit
    Q("q_neardup_eval",
      (s, dir) => Dedup.neardupEval(docsS(s, dir)),
      Some(Dedup.neardupEvalSql())),

    // embedding-cosine near-dup (LSH-blocked, exact-verified; plane count
    // scales with corpus size)
    Q("q_cosine_neardup",
      (s, dir) => Similarity.cosineNearDup(embsS(s, dir),
          Similarity.planesFor(embCount(dir)))
        .orderBy("vec_a", "vec_b"),
      Some(Similarity.cosineNearDupSql(
        Similarity.planesFor(oracleEmbCount)))),

    // IVF ANN: coarse-quantizer cells + nProbe probing; centroid count
    // scales as √n (the assignment/probe balance point)
    Q("q_ann_ivf_topk",
      (s, dir) => Similarity.ivfTopK(embsS(s, dir),
          Similarity.centroidsFor(embCount(dir)))
        .orderBy("q_id", "rank"),
      Some(Similarity.ivfTopKSql(
        Similarity.centroidsFor(oracleEmbCount)))),

    // brute-force cosine ANN (exact baseline):
    Q("q_ann_cosine_topk",
      (s, dir) => Similarity.cosineTopK(embsS(s, dir))
        .orderBy("q_id", "rank"),
      Some(Similarity.cosineTopKSql())),

    // hard-negative mining (top-k similar with a DIFFERENT label)
    Q("q_hard_negatives",
      (s, dir) => Similarity.hardNegatives(embsS(s, dir))
        .orderBy("q_id", "rank"),
      Some(Similarity.hardNegativesSql())),

    // kNN label-vote pseudo-labeling + its held-out accuracy view
    Q("q_knn_classify",
      (s, dir) => Similarity.knnClassify(embsS(s, dir)),
      Some(Similarity.knnClassifySql())),

    // semantic decontamination: corpus vectors cosine-near ANY eval-slice
    // (label 0) vector are contaminated; eval suite broadcast, map-side max
    Q("q_sem_decontam",
      (s, dir) => Similarity.semDecontam(embsS(s, dir)).orderBy("vec_id"),
      Some(Similarity.semDecontamSql())),

    // product-quantization codes (IVF's companion compression: 4-bit
    // nibble per subspace, integer-quantized reconstruction error)
    Q("q_pq_code",
      (s, dir) => Similarity.pqCodes(embsS(s, dir)).orderBy("vec_id"),
      Some(Similarity.pqCodesSql())),

    // production-width PQ: 256 centroids = one BYTE per subspace (the
    // FAISS default); codes pack as two hex digits per subspace because
    // a numeric pack of 8 byte codes would overflow a signed 64-bit
    Q("q_pq_code256",
      (s, dir) => Similarity.pqCodes(embsS(s, dir), nCentroids = 256)
        .orderBy("vec_id"),
      Some(Similarity.pqCodesSql(nCentroids = 256))),

    // TRAINED PQ codes: per-subspace codebooks learned by grouped Lloyd
    // (bit-exact trained quantizers; lower error than seed codebooks)
    Q("q_pq_trained_code",
      (s, dir) => Similarity.pqTrainedCodes(embsS(s, dir))
        .orderBy("vec_id"),
      Some(Similarity.pqTrainedCodesSql())),

    // ADC top-k over the PQ codes (compressed-domain search: LUT join,
    // integer-quantized order-free distance sums)
    Q("q_pq_adc_topk",
      (s, dir) => Similarity.pqAdcTopK(embsS(s, dir))
        .orderBy("q_id", "rank"),
      Some(Similarity.pqAdcTopKSql())),

    // IVF-ADC: coarse-cell restriction + compressed-domain ranking (the
    // composed FAISS serving shape — a query touches nProbe/nCells of
    // the corpus and no corpus floats)
    Q("q_ivf_adc_topk",
      (s, dir) => Similarity.ivfAdcTopK(embsS(s, dir))
        .orderBy("q_id", "rank"),
      Some(Similarity.ivfAdcTopKSql())),

    // residual IVF-PQ (full FAISS IVFPQ: codes on cell residuals,
    // per-probed-cell query LUTs)
    Q("q_ivfpq_topk",
      (s, dir) => Similarity.ivfPqTopK(embsS(s, dir))
        .orderBy("q_id", "rank"),
      Some(Similarity.ivfPqTopKSql())),

    // LSH bucket assignment (scale path for ANN; planes = planesFor(n) so
    // bucket count tracks corpus size — 4 planes at n=500, 5 at n=2000)
    Q("q_ann_lsh_buckets",
      (s, dir) => Similarity.lshBuckets(embsS(s, dir),
          Similarity.planesFor(embCount(dir))).orderBy("vec_id"),
      Some(Similarity.lshBucketsSql(
        Similarity.planesFor(oracleEmbCount)))),

    // nearest neighbor within LSH bucket
    Q("q_ann_lsh_nearest",
      (s, dir) => Similarity.lshNearest(embsS(s, dir),
          Similarity.planesFor(embCount(dir))).orderBy("q_id"),
      Some(Similarity.lshNearestSql(
        Similarity.planesFor(oracleEmbCount)))),

    // deterministic k-means training (integer-quantized Lloyd means —
    // the trained coarse quantizer, bit-exact across engines)
    Q("q_kmeans",
      (s, dir) => Similarity.kmeansCentroids(embsS(s, dir))
        .orderBy("cid"),
      Some(Similarity.kmeansCentroidsSql())),

    // IVF over TRAINED cells: the train -> index -> search loop closed,
    // all oracle-gated (cells = bit-exact Lloyd means)
    Q("q_ivf_trained_topk",
      (s, dir) => Similarity.ivfTrainedTopK(embsS(s, dir))
        .orderBy("q_id", "rank"),
      Some(Similarity.ivfTrainedTopKSql())),

    // FULLY-TRAINED residual IVF-PQ: trained cells + codebooks trained
    // on residuals + per-cell ADC — the production composition, every
    // stage oracle-gated
    Q("q_ivfpq_trained_topk",
      (s, dir) => Similarity.ivfPqTrainedTopK(embsS(s, dir))
        .orderBy("q_id", "rank"),
      Some(Similarity.ivfPqTrainedTopKSql())),

    // ---- trained-index catalog (VERDICT r15 #2): train once, persist
    // artifact + manifest, serve many. The Spark serving reads LOAD the
    // persisted centroids/codebooks; each catalog gate's DuckDB twin
    // reads the SAME parquet artifact (read_parquet, zero training
    // CTEs), while the q_*_trained_* gates above keep their RETRAINING
    // twins — both green together proves persisted ≡ retrained
    // bit-for-bit, the invariant the catalog's semantics-keyed
    // invalidation maintains.

    // catalog listing: every artifact's manifest read back from disk,
    // joined with a live-corpus freshness check
    Q("q_index_manifest",
      (s, dir) => IndexCatalog.manifests(embsS(s, dir)),
      Some(IndexCatalog.manifestsSql(Tables.oracleSfDir.get))),

    // IVF serving read off the persisted coarse quantizer
    Q("q_ivf_catalog_topk",
      (s, dir) => Similarity.ivfTrainedTopK(embsS(s, dir))
        .orderBy("q_id", "rank"),
      Some(Similarity.ivfCatalogTopKSql(Tables.oracleSfDir.get))),

    // PQ encode off the persisted codebook
    Q("q_pq_catalog_code",
      (s, dir) => Similarity.pqTrainedCodes(embsS(s, dir))
        .orderBy("vec_id"),
      Some(Similarity.pqCatalogCodeSql(Tables.oracleSfDir.get))),

    // IVF-PQ ADC serving read off BOTH persisted artifacts
    Q("q_ivfpq_catalog_topk",
      (s, dir) => Similarity.ivfPqTrainedTopK(embsS(s, dir))
        .orderBy("q_id", "rank"),
      Some(Similarity.ivfPqCatalogTopKSql(Tables.oracleSfDir.get))),

    // in-engine ANN recall audit: LSH vs brute ground truth on a sample
    // per-dimension embedding health audit (collapsed/dead/runaway dims
    // before any index build); fixed-point moments
    Q("q_embed_stats",
      (s, dir) => Similarity.embedStats(embs(s, dir)).orderBy("dim"),
      Some(Similarity.embedStatsSql())),

    // Matryoshka truncation audit: prefix-dim 1-NN recall vs the
    // full-dim ground truth — the dimension-budget curve
    Q("q_mrl_recall",
      (s, dir) => Similarity.mrlRecall(embsS(s, dir)).orderBy("dim"),
      Some(Similarity.mrlRecallSql())),

    Q("q_ann_recall",
      (s, dir) => Similarity.annRecall(embsS(s, dir),
        Similarity.planesFor(embCount(dir))),
      Some(Similarity.annRecallSql(
        Similarity.planesFor(oracleEmbCount)))),

    // multi-probe LSH nearest: own + every Hamming-1 bucket (recall lever)
    Q("q_ann_lsh_multiprobe",
      (s, dir) => Similarity.lshNearestMultiProbe(embsS(s, dir),
          Similarity.planesFor(embCount(dir)))
        .orderBy("q_id"),
      Some(Similarity.lshNearestMultiProbeSql(
        Similarity.planesFor(oracleEmbCount)))),

    // SemDeDup: k-means cells + within-cell cosine near-twin drop
    // (keep-lowest-id); cell count holds cell SIZE constant (k ≈ n/64,
    // semCellsFor — the dial that keeps the pair surface linear in the
    // corpus; ScaleProbeSpec measures it). τ=0.25 sits inside this
    // synthetic corpus's similarity band (pairwise max ≈0.40, p99
    // ≈0.29) so the drop path actually exercises; production embeddings
    // use the canonical ≈0.8 default.
    Q("q_semdedup",
      (s, dir) => Similarity.semDedupFrom(cellAssignmentFor(s, dir),
          threshold = 0.25)
        .orderBy("vec_id"),
      Some(Similarity.semDedupSql(
        Similarity.semCellsFor(oracleEmbCount), threshold = 0.25))),

    // cluster-balanced diversity sampling: at most cap vectors per
    // k-means cell, md5-stable choice (the semantic sourceCap)
    Q("q_cell_balance",
      (s, dir) => Similarity.cellBalanceFrom(cellAssignmentFor(s, dir),
          cap = 32)
        .orderBy("vec_id"),
      Some(Similarity.cellBalanceSql(
        Similarity.semCellsFor(oracleEmbCount)))),

    // per-label centroid drift vs the corpus centroid (embedding-space
    // mixture monitor; quantized-exact per-dim sums)
    Q("q_centroid_drift",
      (s, dir) => Similarity.centroidDrift(
        graft.Tables.table(s, dir, "embeddings")),
      Some(Similarity.centroidDriftSql())),

    // dominant PCA axis via exact-integer power iteration: the
    // collapse-monitor projection axis; identical integer vectors in
    // both engines by construction
    Q("q_principal_axis",
      (s, dir) => Similarity.principalAxis(
        graft.Tables.table(s, dir, "embeddings")),
      Some(Similarity.principalAxisSql())),

    // per-vector projection onto that axis: exact integer dot with
    // the broadcast axis table, one two-division IEEE emission
    Q("q_axis_projection",
      (s, dir) => Similarity.axisProjection(
        graft.Tables.table(s, dir, "embeddings")),
      Some(Similarity.axisProjectionSql())),

    // TwoNN intrinsic-dimension estimate: exact integer 2-NN
    // distances over quantized coordinates, one floor-quantized log
    // ratio per point — the scalar embedding-collapse monitor next
    // to the principal-axis direction monitor
    Q("q_twonn",
      (s, dir) => Similarity.twoNN(
        graft.Tables.table(s, dir, "embeddings")),
      Some(Similarity.twoNNSql())),

    // TwoNN through the IVF candidate machinery — the corpus-wide
    // arm (no maxVectors guard): trained cells, probing equi-join,
    // exact integer re-check on candidates, identical MLE chain;
    // R15WaveSpec pins indexed == exact all-pairs on this corpus
    Q("q_twonn_indexed",
      (s, dir) => Similarity.twoNNIndexed(
        graft.Tables.table(s, dir, "embeddings")),
      Some(Similarity.twoNNIndexedSql())),

    // TwoNN candidates off the persisted coarse quantizer — the
    // catalog-serving member of the family (twin reads the artifact)
    Q("q_twonn_catalog",
      (s, dir) => Similarity.twoNNIndexed(
        graft.Tables.table(s, dir, "embeddings")),
      Some(Similarity.twoNNCatalogSql(Tables.oracleSfDir.get))),

    // token counting
    Q("q_token_count",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id"),
      Some(s"SELECT doc_id, ${TextOps.tokenCountSql} AS n_tokens " +
        "FROM documents ORDER BY doc_id")),

    // BPE-ish subword token count (GPT-2-style pre-tokenizer classes)
    Q("q_token_count_bpe",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          TextOps.bpeTokenCount(col("text")).as("n_bpe"))
        .orderBy("doc_id"),
      Some(s"SELECT doc_id, ${TextOps.bpeTokenCountSql} AS n_bpe " +
        "FROM documents ORDER BY doc_id")),

    // BM25 keyword search (quantized-ln idf, ordered term chain)
    Q("q_bm25",
      (s, dir) => TextOps.bm25(docsS(s, dir), BM25Terms),
      Some(TextOps.bm25Sql(BM25Terms))),

    // full BM25 inverted index: per-(term, doc) precomputed tscore —
    // the static serving artifact the streaming search path joins
    Q("q_bm25_index",
      (s, dir) => TextOps.bm25Index(docsS(s, dir))
        .orderBy("term", "doc_id"),
      Some(TextOps.bm25IndexSql())),

    // TF-IDF keyword extraction: top terms per document
    Q("q_tfidf_topterms",
      (s, dir) => TextOps.tfidfTopTerms(docsS(s, dir))
        .orderBy("doc_id", "rank"),
      Some(TextOps.tfidfTopTermsSql())),

    // TF-IDF cosine document similarity (text-space near-dup, inverted
    // index blocked on discriminative terms: df <= 5% of corpus — a
    // RATIO cap so the blocking is non-degenerate at every SF)
    Q("q_tfidf_cosine",
      (s, dir) => TextOps.tfidfCosine(docsS(s, dir),
          TextOps.dfMaxFor(docCount(dir)))
        .orderBy("doc_a", "doc_b"),
      Some(TextOps.tfidfCosineSql(TextOps.dfMaxFor(oracleDocCount)))),

    // quality scoring
    Q("q_quality",
      (s, dir) => TextOps.quality(docs(s, dir)).orderBy("doc_id"),
      Some(TextOps.qualitySql)),

    // deterministic stratified sampling: downsample 'en', keep the tail
    Q("q_sample_stratified",
      (s, dir) => TextOps.stratifiedSample(docs(s, dir), col("lang"),
          SampleRates, defaultRate = 0.9).orderBy("doc_id"),
      Some(TextOps.stratifiedSampleSql("lang", SampleRates,
        defaultRate = 0.9))),

    // C4-style scrubbing: URL/email placeholders + whitespace normalize
    Q("q_text_clean",
      (s, dir) => TextOps.clean(docsS(s, dir)).orderBy("doc_id"),
      Some(TextOps.cleanSql)),

    // Gopher-style repetition signals (top n-gram share, type-token ratio)
    Q("q_repetition",
      (s, dir) => TextOps.repetition(docsS(s, dir)).orderBy("doc_id"),
      Some(TextOps.repetitionSql())),

    // C4/Gopher keep/drop filter with per-rule attribution flags
    Q("q_quality_filter",
      (s, dir) => TextOps.qualityFilter(docs(s, dir)).orderBy("doc_id"),
      Some(TextOps.qualityFilterSql())),

    // distilled quality classifier: class-weighted linear probe trained
    // by fixed-point (order-independent) distributed gradient descent
    // to mimic the rule cascade — the fastText-distillation pattern
    Q("q_quality_classifier",
      (s, dir) => classifierScoredFor(s, dir).orderBy("doc_id"),
      Some(TextOps.qualityClassifierSql())),

    // reliability table: score deciles vs empirical rule-pass rate —
    // reads the SAME memoized training run as the score table
    Q("q_classifier_calibration",
      (s, dir) => TextOps.classifierCalibration(classifierScoredFor(s, dir))
        .orderBy("bucket"),
      Some(TextOps.classifierCalibrationSql())),

    // per-language disparate-impact audit: keep rates + mean score by
    // lang off the same memoized training run
    Q("q_classifier_bias",
      (s, dir) => TextOps.classifierBias(classifierScoredFor(s, dir),
          docs(s, dir)).orderBy("lang"),
      Some(TextOps.classifierBiasSql())),

    // Zipf rank-frequency slope per language (natural language ~ -1;
    // spam/synthetic filler bends toward 0) — integer-exact least squares
    Q("q_zipf_fit",
      (s, dir) => TextOps.zipfFit(docs(s, dir)).orderBy("lang"),
      Some(TextOps.zipfFitSql())),

    // per-source OOV rate against the corpus top-V vocab — the
    // tokenizer-coverage audit next to fertility
    Q("q_oov_rate",
      (s, dir) => TextOps.oovRate(docsS(s, dir)).orderBy("source"),
      Some(TextOps.oovRateSql())),

    // per-source unigram KL drift from the corpus distribution (which
    // source is distributionally unlike the rest) — integer-quantized
    // logs, decimal sums, one final division
    Q("q_source_drift",
      (s, dir) => TextOps.sourceDrift(docsS(s, dir)).orderBy("source"),
      Some(TextOps.sourceDriftSql())),

    // Flesch reading ease per source: exact regex-count sums, two
    // IEEE divisions; >=1-sentence-per-doc floor
    Q("q_readability",
      (s, dir) => TextOps.readability(docsS(s, dir)).orderBy("source"),
      Some(TextOps.readabilitySql())),

    // Heaps vocabulary-growth exponent per language — the companion
    // of the Zipf slope; checkpoint-grid cumulatives, integer-exact
    // least squares
    Q("q_heaps_law",
      (s, dir) => TextOps.heapsLaw(docs(s, dir)).orderBy("lang"),
      Some(TextOps.heapsLawSql())),

    // per-source Jensen-Shannon divergence from the corpus token
    // distribution — symmetric/bounded companion of the KL drift;
    // integer mixture ratios, absent-word mass in closed form
    Q("q_jsd_sources",
      (s, dir) => TextOps.jsdSources(docsS(s, dir)).orderBy("source"),
      Some(TextOps.jsdSourcesSql())),

    // per-doc Gopher repetition signals: duplicate-line fractions,
    // top-2gram and duplicated-5gram character coverage — the
    // standard self-repetition pretraining filters; exact integer
    // counts, one IEEE division per fraction
    Q("q_repetition_coverage",
      (s, dir) => TextOps.repetitionCoverage(docsS(s, dir)),
      Some(TextOps.repetitionCoverageSql())),

    // per-source PSI of the doc-length histogram vs the corpus —
    // shape drift orthogonal to the vocabulary KL above; fixed
    // integer bin ladder, smoothed, quantized logs, decimal sum
    Q("q_length_psi",
      (s, dir) => graft.ext.DriftStats.lengthPsi(docs(s, dir))
        .orderBy("source"),
      Some(graft.ext.DriftStats.lengthPsiSql())),

    // per-source domain scorecard: totals + quality-filter pass rate
    Q("q_source_quality",
      (s, dir) => TextOps.sourceQuality(docs(s, dir)).orderBy("source"),
      Some(TextOps.sourceQualitySql())),

    // per-source Gini of doc token counts: exact rank identity,
    // deterministic (n_tokens, doc_id) ranking
    Q("q_length_gini",
      (s, dir) => TextOps.lengthGini(docs(s, dir)),
      Some(TextOps.lengthGiniSql())),

    // BPE merge induction: k rounds of tokenizer TRAINING (most frequent
    // pair -> merge everywhere -> recount), the learned merge table
    Q("q_bpe_merges",
      (s, dir) => TextOps.bpeMerges(docsS(s, dir)),
      Some(TextOps.bpeMergesSql())),

    // BPE segmentation: every distinct word tokenized by the learned
    // merges (the training round-trip a tokenizer ships)
    Q("q_bpe_segment",
      (s, dir) => TextOps.bpeSegment(docsS(s, dir)).orderBy("term"),
      Some(TextOps.bpeSegmentSql())),

    // per-doc token count under the TRAINED tokenizer (what budgets and
    // packing measure once merges exist)
    Q("q_bpe_doc_tokens",
      (s, dir) => TextOps.bpeDocTokens(docsS(s, dir)).orderBy("doc_id"),
      Some(TextOps.bpeDocTokensSql())),

    // tokenizer fertility per language (pieces/word under the trained
    // merges — the multilingual vocab-budget signal)
    Q("q_bpe_fertility",
      (s, dir) => TextOps.bpeFertility(docsS(s, dir)).orderBy("lang"),
      Some(TextOps.bpeFertilitySql())),

    // phrase/collocation scores (word2phrase: merge candidates before
    // tokenizer/embedding training)
    Q("q_phrase_scores",
      (s, dir) => TextOps.phraseScores(docsS(s, dir))
        .orderBy("w1", "w2"),
      Some(TextOps.phraseScoresSql())),

    // vocabulary induction: top-V corpus words (tokenizer seed step)
    Q("q_vocab",
      (s, dir) => TextOps.vocab(docs(s, dir)),
      Some(TextOps.vocabSql())),

    // corpus-frequency log-prob (word-rarity quality proxy, lnQ-exact)
    Q("q_unigram_logprob",
      (s, dir) => TextOps.unigramLogProb(docs(s, dir)).orderBy("doc_id"),
      Some(TextOps.unigramLogProbSql)),

    // interpolated bigram LM log-prob (CCNet-style quality: word ORDER,
    // not just rarity — the n-gram perplexity signal pipelines gate on)
    Q("q_bigram_logprob",
      (s, dir) => lmScoredFor(s, dir)
        .select("doc_id", "n_bigrams", "avg_logprob").orderBy("doc_id"),
      Some(TextOps.bigramLogProbSql())),

    // CCNet perplexity bucketing: per-language head/middle/tail terciles
    // of the bigram-LM score (rank-based, doc_id tiebreak — bit-portable)
    Q("q_ppl_buckets",
      (s, dir) => TextOps.pplBucketsFromScored(lmScoredFor(s, dir))
        .orderBy("doc_id"),
      Some(TextOps.pplBucketsSql())),

    // the tercile boundary-key table via the DISTRIBUTED bucketed-rank
    // plan (the >10M-row dispatch arm run unconditionally here): the
    // scale path itself is oracle-gated against DuckDB's ntile-rank cut
    Q("q_ppl_bounds",
      (s, dir) => TextOps.pplBoundaryBucketedPlan(lmScoredFor(s, dir))
        .orderBy("lang"),
      Some(TextOps.pplBoundsSql())),

    // hashing-trick doc vectors: signed md5 bucket counts, sparse output
    Q("q_hash_embed",
      (s, dir) => TextOps.hashEmbed(docsS(s, dir))
        .orderBy("doc_id", "bucket"),
      Some(TextOps.hashEmbedSql())),

    // the trained bigram-LM artifact itself (w1, w2, q_lnp) — the table
    // the streaming scorer serves; full model oracle-gated bit-exact
    Q("q_lm_model",
      (s, dir) => TextOps.bigramModel(docs(s, dir)).orderBy("w1", "w2"),
      Some(TextOps.bigramModelSql())),

    // the PRUNED serving model (lmModelOf's bound): both engines derive
    // minCount = ceil(n_tokens / targetRows) from the corpus itself —
    // the engine IN-PLAN off the model's own corpus-total broadcast, the
    // oracle as a SQL subquery; targetRows 2000 engages the prune at
    // BOTH gated SFs (minCount 14 at sf0.01, 136 at sf0.1) while
    // pigeonhole-bounding the rows
    Q("q_lm_model_pruned",
      (s, dir) => TextOps.bigramModelBudget(docs(s, dir),
        targetRows = 2000L).orderBy("w1", "w2"),
      Some(TextOps.bigramModelSql(targetRows = Some(2000L)))),

    // character-distribution entropy (gibberish / encoding-junk signal)
    Q("q_char_entropy",
      (s, dir) => TextOps.charEntropy(docsS(s, dir)).orderBy("doc_id"),
      Some(TextOps.charEntropySql)),

    // language id heuristic
    Q("q_langid",
      (s, dir) => TextOps.langId(docsS(s, dir)).orderBy("doc_id"),
      Some(TextOps.langIdSql)),

    // concat-and-chunk sequence packing (per-shard token-cumsum windows)
    Q("q_pack_sequences",
      (s, dir) => Pipeline.packSequences(docs(s, dir)).orderBy("doc_id"),
      Some(Pipeline.packSequencesSql())),

    // per-sequence packing manifest (inverse view: loader integrity check)
    Q("q_pack_manifest",
      (s, dir) => Pipeline.packManifest(docs(s, dir))
        .orderBy("shard", "seq"),
      Some(Pipeline.packManifestSql())),

    // strided sliding-window manifest (overlapping long-context windows;
    // sf docs are short, so a small window exercises multi-window docs)
    Q("q_pack_strided",
      (s, dir) => Pipeline.packStrided(docs(s, dir), seqLen = 32,
          stride = 16).orderBy("doc_id", "win_idx"),
      Some(Pipeline.packStridedSql(seqLen = 32, stride = 16))),

    // epoch-weighted mixture sampling (2.5 epochs of src0, 0.4 of src1)
    Q("q_mixture",
      (s, dir) => Pipeline.mixtureSample(docs(s, dir), MixtureWeights,
          defaultWeight = 1.0).orderBy("doc_id", "copy"),
      Some(Pipeline.mixtureSampleSql(MixtureWeights, defaultWeight = 1.0))),

    // train/eval n-gram decontamination report
    Q("q_decontam",
      (s, dir) => Pipeline.decontaminate(docsS(s, dir)).orderBy("doc_id"),
      Some(Pipeline.decontaminateSql())),

    // per-doc n-gram novelty: share of grams first seen in this doc
    Q("q_gram_novelty",
      (s, dir) => Pipeline.gramNovelty(docs(s, dir)).orderBy("doc_id"),
      Some(Pipeline.gramNoveltySql())),

    // cross-doc duplicated-span fraction (exact-substring dedup signal)
    Q("q_dup_spans",
      (s, dir) => Pipeline.dupSpans(docsS(s, dir)).orderBy("doc_id"),
      Some(Pipeline.dupSpansSql())),

    // maximal duplicated spans: adjacent duplicated grams coalesced to
    // Lee-et-al-style span coordinates (gaps-and-islands over offsets)
    Q("q_dup_spans_merged",
      (s, dir) => Pipeline.dupSpansMerged(docsS(s, dir))
        .orderBy("doc_id", "span_start"),
      Some(Pipeline.dupSpansMergedSql())),

    // duplicated-span REMOVAL apply: maximal spans cut out of each doc,
    // surviving text reassembled (the Lee-et-al substring-dedup apply)
    Q("q_dup_spans_removed",
      (s, dir) => Pipeline.dupSpansRemoved(docsS(s, dir))
        .orderBy("doc_id"),
      Some(Pipeline.dupSpansRemovedSql())),

    // per-source order-independent content checksum (transfer-integrity
    // manifest; additive md5-prefix sum mod 2^31-1)
    Q("q_corpus_checksum",
      (s, dir) => Pipeline.corpusChecksum(docs(s, dir)).orderBy("source"),
      Some(Pipeline.corpusChecksumSql())),

    // corpus snapshot diff: per-source added/removed/modified/unchanged
    // churn + token delta between two derived snapshots
    Q("q_corpus_diff",
      (s, dir) => Pipeline.corpusDiffGate(docs(s, dir))
        .orderBy("source", "change"),
      Some(Pipeline.corpusDiffSql())),

    // per-doc provenance ledger: every stage's independent verdict +
    // composed keep + first-failing-stage drop attribution
    Q("q_provenance",
      (s, dir) => Pipeline.provenance(docs(s, dir)).orderBy("doc_id"),
      Some(Pipeline.provenanceSql())),

    // duplication profile: cross-doc duplicated-gram mass vs gram size
    // (the dial-choosing knee curve for the span-dedup family)
    Q("q_dup_profile",
      (s, dir) => Pipeline.dupProfile(docsS(s, dir)).orderBy("n"),
      Some(Pipeline.dupProfileSql())),

    // intra-doc repeated-gram removal: within-page boilerplate cut,
    // first occurrence kept, gaps-and-islands coalescing per doc
    Q("q_intradoc_dedup",
      (s, dir) => Pipeline.intradocDedup(docsS(s, dir)).orderBy("doc_id"),
      Some(Pipeline.intradocDedupSql())),

    // content-defined chunk dedup (FastCDC at word level): boundaries
    // from rolling-hash residue, shift-robust where fixed chunks are not
    Q("q_cdc_chunk_dedup",
      (s, dir) => Pipeline.cdcChunkDedup(docsS(s, dir)).orderBy("doc_id"),
      Some(Pipeline.cdcChunkDedupSql())),

    // chunk-level dedup (RefinedWeb line-dedup analog): 20-word chunks,
    // keep-first by content hash, per-doc reassembly
    Q("q_chunk_dedup",
      (s, dir) => Pipeline.chunkDedup(docsS(s, dir)).orderBy("doc_id"),
      Some(Pipeline.chunkDedupSql())),

    // Bloom-filter decontamination: fixed-size relational bloom of eval
    // grams; deterministic md5 probes — bit-exact across engines
    // r17 A/B at 32 cores (VERDICT r16 #8): spread vs raw measured
    // 1.98 vs 2.08 best-warm over 5 isolated runs; the driver's 4.85 s
    // 32-core outlier reproduces under host contention in BOTH arms
    // (calib 1.0-1.4 runs read 5-6 s either way) — contention, not the
    // spread exchange. Spread kept: equal-or-better, and the gram
    // explode + 3×md5 map side is exactly the CPU the spread exists
    // to parallelize.
    Q("q_bloom_decontam",
      (s, dir) => Pipeline.bloomDecontam(docsS(s, dir))
        .orderBy("doc_id"),
      Some(Pipeline.bloomDecontamSql())),

    // DSIR importance weights: unigram log-likelihood ratio vs the
    // src0 target slice, lnQ-quantized, llr>0 selection cut
    Q("q_dsir_weights",
      (s, dir) => Pipeline.dsirWeights(docsS(s, dir)).orderBy("doc_id"),
      Some(Pipeline.dsirWeightsSql())),

    // END-TO-END corpus assembly: quality → dedup keepers → decontam
    // drop (≥2 shared grams) → source cap → token budget, composed on
    // each stage's survivor set — the full loop under one oracle
    Q("q_corpus_e2e",
      (s, dir) => Pipeline.corpusAssembly(docsS(s, dir))
        .orderBy("doc_id"),
      Some(Pipeline.corpusAssemblySql())),

    // END-TO-END with the LEARNED gate: the trained probe's keep_pred
    // replaces the rule cascade as stage 1; stages 2..5 identical
    Q("q_corpus_e2e_ml",
      (s, dir) => Pipeline.corpusAssemblyMl(docsS(s, dir),
          classifierScoredFor(s, dir)).orderBy("doc_id"),
      Some(Pipeline.corpusAssemblyMlSql())),

    // per-source document cap (domain balancing, deterministic md5 order)
    Q("q_source_cap",
      (s, dir) => Pipeline.sourceCap(docs(s, dir), k = 20)
        .orderBy("doc_id"),
      Some(Pipeline.sourceCapSql(k = 20))),

    // per-source token budget (budgeted mixture: first B tokens/source;
    // 800 < every source's total at sf0.01 — the cutoff always fires)
    Q("q_token_budget",
      (s, dir) => Pipeline.tokenBudget(docs(s, dir), budget = 800L)
        .orderBy("doc_id"),
      Some(Pipeline.tokenBudgetSql(budget = 800L))),

    // UniMax language-budget allocation: water-filling under a repeat
    // cap, all-integer closed form, budget derived from the corpus
    Q("q_unimax",
      (s, dir) => Pipeline.unimaxAlloc(docs(s, dir)).orderBy("lang"),
      Some(Pipeline.unimaxAllocSql())),

    // UniMax applied: per-lang md5-ordered selection under the JOINED
    // allocation column (tokenBudget with a data-derived budget table)
    Q("q_unimax_apply",
      (s, dir) => Pipeline.unimaxApply(docs(s, dir)).orderBy("doc_id"),
      Some(Pipeline.unimaxApplySql())),

    // the salted two-stage exact prefix sum (unimaxApply's >10M-row
    // dispatch arm run unconditionally here): the stitched cumsum is
    // oracle-gated bit-exact against DuckDB's single-window cumsum
    Q("q_cumsum_salted",
      (s, dir) => {
        val base = docs(s, dir).select(col("doc_id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        Pipeline.saltedCumTokens(base, "lang")
          .select("doc_id", "lang", "n_tokens", "cum_tokens")
          .orderBy("doc_id")
      },
      Some(Pipeline.saltedCumSumSql())),

    // temperature-scaled sampling (p ∝ n^α at α=1/2 — the one exponent
    // where the power is bit-portable sqrt); integer-quantized weights
    // so the normalizer is order-independent
    Q("q_mixture_temp",
      (s, dir) => Pipeline.mixtureTemp(docs(s, dir)).orderBy("lang"),
      Some(Pipeline.mixtureTempSql())),

    // sequence-length histogram per source (power-of-2 edges)
    Q("q_len_hist",
      (s, dir) => Pipeline.lenHist(docs(s, dir))
        .orderBy("source", "bucket_lo"),
      Some(Pipeline.lenHistSql())),

    // per-source token-length percentiles: rank-based cut values, no
    // interpolation — the dial-setting companion to the histogram
    Q("q_len_percentiles",
      (s, dir) => Pipeline.lenPercentiles(docs(s, dir)).orderBy("source"),
      Some(Pipeline.lenPercentilesSql())),

    // mixture audit table: per (source, lang) doc/token/char totals
    Q("q_corpus_stats",
      (s, dir) => Pipeline.corpusStats(docs(s, dir))
        .orderBy("source", "lang"),
      Some(Pipeline.corpusStatsSql)),

    // per-vector symmetric int8 embedding quantization
    Q("q_embed_quant",
      (s, dir) => Pipeline.quantizeEmbeddings(embs(s, dir))
        .orderBy("vec_id"),
      Some(Pipeline.quantizeEmbeddingsSql)),

    // multimodal decode plumbing (stub kernel, real batching)
    Q("q_multimodal_meta",
      (s, dir) => Multimodal.decodeMeta(docs(s, dir)).orderBy("doc_id"),
      Some(Multimodal.decodeMetaSql)),

    // video frame sampling (sequence+explode Generate, no UDF)
    Q("q_frame_sample",
      (s, dir) => Multimodal.frameSample(docs(s, dir))
        .orderBy("doc_id", "frame_idx"),
      Some(Multimodal.frameSampleSql())),

    // image resize plumbing (mapPartitions batch kernel, stub scaler)
    Q("q_resize",
      (s, dir) => Multimodal.resizeStub(docs(s, dir), 224, 224)
        .orderBy("doc_id"),
      Some(Multimodal.resizeStubSql(224, 224))),

    // REAL video pixel decode: deterministic solid-gray DIB-in-AVI
    // payloads built per doc (frame i gray = (doc_id*31+i*7)%256), then
    // the genuine RIFF walk + frame decode + integer luma stats, frames
    // sampled every 2 — DuckDB replays the stats arithmetically, so a
    // broken walk/stride/bottom-up order fails the gate bit-exactly
    Q("q_frame_stats",
      (s, dir) => {
        val enc = org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY)
        val avis = docsS(s, dir).select("doc_id")
          .map(r => (r.getLong(0), Multimodal.syntheticAvi(r.getLong(0),
            nFrames = 1 + (r.getLong(0) % 4).toInt, w = 16, h = 8)))(enc)
          .toDF("doc_id", "payload")
        Multimodal.decodeVideoFrames(avis, everyK = 2)
          .orderBy("doc_id", "frame_idx")
      },
      Some("""SELECT doc_id, frame_idx,
        | CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        | CAST(128 AS BIGINT) AS n_px,
        | CAST(((doc_id*31 + frame_idx*7) % 256) * 128 AS BIGINT)
        |  AS luma_sum,
        | CAST((doc_id*31 + frame_idx*7) % 256 AS DOUBLE) AS mean_luma
        |FROM (SELECT doc_id,
        |  unnest(generate_series(0, doc_id % 4, 2)) AS frame_idx
        | FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin.replace('\n', ' '))),

    // MJPEG-in-MP4 pixel decode (VERDICT r9 #7): the ISO-BMFF twin of
    // q_frame_stats — deterministic solid-gray JPEG samples (quality
    // 1.0 round-trips solid gray bit-exactly through the JDK codec)
    // addressed through a REAL stsz/stsc/stco sample-table walk (two
    // samples per chunk), decoded by the same frame kernel. Identical
    // oracle arithmetic: a broken box walk, chunk-offset sum, or JPEG
    // decode fails the gate bit-exactly.
    Q("q_mp4_frame_stats",
      (s, dir) => {
        val enc = org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY)
        val mp4s = docsS(s, dir).select("doc_id")
          .map(r => (r.getLong(0), Multimodal.syntheticMjpegMp4(
            r.getLong(0), nFrames = 1 + (r.getLong(0) % 4).toInt,
            w = 16, h = 8)))(enc)
          .toDF("doc_id", "payload")
        Multimodal.decodeVideoFrames(mp4s, everyK = 2)
          .orderBy("doc_id", "frame_idx")
      },
      Some("""SELECT doc_id, frame_idx,
        | CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        | CAST(128 AS BIGINT) AS n_px,
        | CAST(((doc_id*31 + frame_idx*7) % 256) * 128 AS BIGINT)
        |  AS luma_sum,
        | CAST((doc_id*31 + frame_idx*7) % 256 AS DOUBLE) AS mean_luma
        |FROM (SELECT doc_id,
        |  unnest(generate_series(0, doc_id % 4, 2)) AS frame_idx
        | FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin.replace('\n', ' ')))
  )
}
