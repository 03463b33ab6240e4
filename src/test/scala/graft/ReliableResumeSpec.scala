package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Kill-and-resume drill for reliable-checkpoint mode (VERDICT r9 #8).
  *
  * `spark.graft.checkpoint.reliable=true` exists so a multi-hour
  * campaign on preemptible infrastructure survives loss: executor loss
  * is covered by Spark's own in-session checkpoint reload; DRIVER loss
  * is covered by the files themselves — they outlive the session
  * object, and a fresh session resumes from them without recomputing
  * the stage. A unit test cannot restart the JVM or the (suite-shared)
  * SparkContext, so the drill simulates the driver restart at the
  * session layer: the campaign session is discarded mid-campaign after
  * its first materialized stage, and a brand-new session — sharing
  * nothing with it but the on-disk checkpoint root — picks the stage
  * up from the part-files. What the drill proves is the FILE contract:
  * the bytes on disk are sufficient and cheaper than recomputation. */
class ReliableResumeSpec extends SparkSpec {

  test("campaign stage resumes from reliable checkpoint files in a " +
      "fresh session: bit-identical rows, resume beats recompute") {
    val ckptRoot = Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptRoot)

    // the campaign stage: minhash signatures over sf0.1 shingles — a
    // real multi-aggregate stage with measurable cost (16 md5 chains
    // over every shingle of 5000 docs)
    def campaignStage(s: SparkSession) = {
      val docs = Tables.table(s, sf("sf0.1"), "documents")
      graft.ext.Dedup.minhashSignature(graft.ext.Dedup.shingles(docs))
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime
      val r = f
      (r, (System.nanoTime - t0) / 1e9)
    }

    // --- session A: the campaign, in reliable mode, dies mid-run
    val sessionA = spark.newSession()
    sessionA.conf.set("spark.graft.checkpoint.reliable", "true")
    val (stage, coldSec) = timed(
      graft.functions.checkpointed(campaignStage(sessionA)))
    val schema = stage.schema
    val want = stage.collect().map(_.toSeq).sortBy(_.head.toString)
    val ckptPath = graft.functions.latestCheckpointPath(ckptRoot)
    assert(ckptPath.isDefined, s"no checkpoint files under $ckptRoot")
    assert(new java.io.File(ckptPath.get).listFiles()
      .exists(_.getName.startsWith("part-")), "no part-files written")
    // hard stop: every reference to session A is dropped here; only
    // the on-disk files and the recorded (path, schema) survive

    // --- session B: fresh session, resume from the files
    val sessionB = spark.newSession()
    assert(sessionB ne sessionA)
    val (resumed, resumeSec) = timed(
      graft.functions.resumeCheckpoint(sessionB, ckptPath.get, schema)
        .collect().map(_.toSeq).sortBy(_.head.toString))
    assert(resumed.length === want.length)
    assert(resumed === want, "resumed rows differ from the campaign's")

    // --- the counter-factual the checkpoint exists for: recomputing
    // the stage from scratch in session B
    val (recomputed, recomputeSec) = timed(
      campaignStage(sessionB).collect().map(_.toSeq)
        .sortBy(_.head.toString))
    assert(recomputed === want)
    info(f"campaign stage: cold (reliable ckpt) $coldSec%.2f s, " +
      f"resume from files $resumeSec%.2f s, recompute $recomputeSec%.2f s")
    assert(resumeSec < recomputeSec,
      f"resume ($resumeSec%.2f s) did not beat recompute " +
        f"($recomputeSec%.2f s)")
  }
}
