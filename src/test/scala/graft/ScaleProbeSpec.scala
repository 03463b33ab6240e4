package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity, TextOps}

/** Scale probe (VERDICT r5 #3): converts the "this blocking scheme
  * survives 100 TB" plan-shape ARGUMENT into measured evidence. No sf1
  * driver data exists, so the probe builds a 10× corpus from sf0.1 by
  * VOCABULARY REMAPPING — copy i prefixes every word with `c<i>_`, so
  * copies are mutually disjoint shards, each with sf0.1's internal
  * duplication structure (replicating text verbatim would instead
  * measure an artifact: giant exact-dup clusters that no real corpus
  * growth produces). Embeddings scale by circular dimension rotation per
  * copy — same geometry, decorrelated LSH projections.
  *
  * For each blocking scheme the probe measures the CANDIDATE-PAIR count
  * (Σ occ·(occ−1)/2 over blocking keys — the join work the cluster
  * actually pays, before any verify filter) and the max bucket occupancy,
  * then asserts:
  *   1. with corpus-derived parameters (bandBitsFor / planesFor /
  *      dfMaxFor) the candidate stream grows ~linearly (≤ 3× the ideal
  *      linear factor) across the 10× scale-up;
  *   2. the counter-factual: the same corpus under the sf0.1-frozen
  *      parameters generates a many-fold larger stream — proving the
  *      parameter scaling, not luck, is what bounds the work.
  */
class ScaleProbeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.1"
  private val Copies = 10

  private lazy val baseDocs =
    Tables.table(spark, sfDir, "documents").select("doc_id", "text")
  private lazy val scaledDocs: DataFrame = {
    val n = Tables.parquetRowCount(s"$sfDir/documents.parquet")
    val one = baseDocs.select(col("doc_id"), col("text"),
      explode(sequence(lit(0), lit(Copies - 1))).as("copy"))
    one.select(
      (col("doc_id") + col("copy") * n).as("doc_id"),
      array_join(transform(split(lower(trim(col("text"))), "\\s+"),
        w => concat(lit("c"), col("copy").cast("string"), lit("_"), w)), " ")
        .as("text"))
      .localCheckpoint(true)
  }

  /** (candidate pairs, max occupancy) of a (key, key2) blocking table. */
  private def pairStats(keyed: DataFrame): (Long, Long) = {
    val occ = keyed.groupBy(keyed.columns.map(col): _*)
      .agg(count(lit(1)).as("c"))
    val r = occ.agg(
      sum(col("c") * (col("c") - 1) / 2).cast("long").as("cand"),
      max(col("c")).as("occ")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** SimHash band table at a given width: (band, value) per doc. */
  private def simhashBands(hashes: DataFrame, bandBits: Int): DataFrame = {
    val nBands = 64 / bandBits
    val mask = (1L << bandBits) - 1
    hashes.select(explode(array((0 until nBands).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), bandBits * b).bitwiseAND(lit(mask))
          .as("v"))): _*)).as("bv"))
      .select(col("bv.band"), col("bv.v"))
  }

  test("simhash banding: corpus-derived width keeps the candidate stream linear at 10x") {
    val nBase = Tables.parquetRowCount(s"$sfDir/documents.parquet")
    val nScaled = nBase * Copies
    val wBase = Dedup.bandBitsFor(nBase)     // 8 bits at n=5000
    val wScaled = Dedup.bandBitsFor(nScaled) // 16 bits at n=50000
    assert(wScaled > wBase, "scale-up must widen the bands")
    val baseHashes = Dedup.simhash(baseDocs).localCheckpoint(true)
    val scaledHashes = Dedup.simhash(scaledDocs).localCheckpoint(true)
    val (candBase, _) = pairStats(simhashBands(baseHashes, wBase))
    val (candScaled, occScaled) =
      pairStats(simhashBands(scaledHashes, wScaled))
    val (candFrozen, occFrozen) =
      pairStats(simhashBands(scaledHashes, wBase))
    info(f"simhash candidates: n=$nBase%d w=$wBase -> $candBase%,d; " +
      f"n=$nScaled%d w=$wScaled -> $candScaled%,d (occ $occScaled%,d); " +
      f"n=$nScaled%d FROZEN w=$wBase -> $candFrozen%,d (occ $occFrozen%,d)")
    assert(candScaled <= candBase * Copies * 3,
      f"banded stream superlinear: $candBase%,d -> $candScaled%,d at ${Copies}x")
    assert(candFrozen >= candScaled * 5,
      f"frozen width should blow up vs scaled: $candFrozen%,d vs $candScaled%,d")
  }

  test("minhash LSH banding: candidate stream stays ~linear at 10x (disjoint shards)") {
    // the band table of minhashNearDup's blocking step (k=16, r=4)
    def bandTable(docs: DataFrame): DataFrame = {
      val sig = Dedup.minhashSignature(Dedup.shingles(docs))
      sig.select(posexplode(array((0 until 4).map(j =>
        md5(concat_ws("", (0 until 4).map(i => col(s"h${j * 4 + i}")): _*))): _*))
        .as(Seq("band", "bval")))
    }
    val (candBase, _) = pairStats(bandTable(baseDocs))
    val (candScaled, occScaled) = pairStats(bandTable(scaledDocs))
    info(f"minhash candidates: base $candBase%,d -> scaled $candScaled%,d " +
      f"(max band-bucket occupancy $occScaled%,d)")
    // disjoint shards: bucket collisions across copies are md5-random;
    // the stream must track the Copies x duplication structure, never n^2
    assert(candScaled <= candBase * Copies * 3,
      f"minhash banding superlinear: $candBase%,d -> $candScaled%,d")
  }

  test("tfidf cosine blocking: fractional df cap bounds the postings join at 10x") {
    def rareStats(docs: DataFrame, dfMax: Long): (Long, Long) = {
      val terms = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .distinct()
      val dfreq = terms.groupBy("term").agg(count(lit(1)).as("df"))
        .where(col("df") <= dfMax && col("df") >= 2)
      pairStats(terms.join(dfreq.select("term"), "term").select("term"))
    }
    val nBase = Tables.parquetRowCount(s"$sfDir/documents.parquet")
    val (candBase, _) = rareStats(baseDocs, TextOps.dfMaxFor(nBase))
    val (candScaled, occScaled) =
      rareStats(scaledDocs, TextOps.dfMaxFor(nBase * Copies))
    info(f"tfidf-blocking candidates: base $candBase%,d -> " +
      f"scaled $candScaled%,d (max posting df $occScaled%,d)")
    assert(occScaled <= TextOps.dfMaxFor(nBase * Copies),
      "df cap not enforced")
    assert(candScaled <= candBase * Copies * 3,
      f"df-capped postings join superlinear: $candBase%,d -> $candScaled%,d")
  }

  test("embedding LSH: planesFor keeps bucket occupancy bounded at 10x") {
    val base = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val nBase = Tables.parquetRowCount(s"$sfDir/embeddings.parquet")
    // circular dimension rotation per copy: same vectors geometrically,
    // decorrelated against the fixed md5-derived hyperplanes
    val scaled = base.select(col("vec_id"), col("embedding"),
      explode(sequence(lit(0), lit(Copies - 1))).as("copy"))
      .select((col("vec_id") + col("copy") * nBase).as("vec_id"),
        concat(slice(col("embedding"), col("copy") * 6 + 1, lit(64)),
          slice(col("embedding"), lit(1), col("copy") * 6)).as("embedding"))
      .localCheckpoint(true)
    val pBase = Similarity.planesFor(nBase)           // 5 at n=2000
    val pScaled = Similarity.planesFor(nBase * Copies) // 9 at n=20000
    assert(pScaled > pBase, "scale-up must add hyperplanes")
    val (candBase, occBase) = pairStats(
      Similarity.lshBuckets(base, pBase).select("bucket"))
    val (candScaled, occScaled) = pairStats(
      Similarity.lshBuckets(scaled, pScaled).select("bucket"))
    val (candFrozen, occFrozen) = pairStats(
      Similarity.lshBuckets(scaled, pBase).select("bucket"))
    info(f"lsh in-bucket candidates: n=$nBase%d p=$pBase -> $candBase%,d " +
      f"(occ $occBase%,d); n=${nBase * Copies}%d p=$pScaled -> " +
      f"$candScaled%,d (occ $occScaled%,d); FROZEN p=$pBase -> " +
      f"$candFrozen%,d (occ $occFrozen%,d)")
    assert(candScaled <= candBase * Copies * 3,
      f"scaled-plane candidates superlinear: $candBase%,d -> $candScaled%,d")
    assert(candFrozen >= candScaled * 3,
      f"frozen planes should blow up vs scaled: $candFrozen%,d vs $candScaled%,d")
  }
}
