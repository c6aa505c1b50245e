package graft.plans

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Stage materialization + manifests — the resume/idempotency contract
 * (BASELINE.json north_rule: "resumable from checkpoint with per-partition
 * lineage + metrics"). The reference memoizes stages by bare file existence
 * (/root/reference/run_bertmap.py:62-67,98-99,107,136-137,213-214); we
 * strengthen that to a content-addressed manifest: a stage's Parquet output
 * is reused only when the recorded fingerprint (stage name + version + the
 * fingerprints of its inputs) matches, otherwise it is recomputed and
 * rewritten atomically (write to tmp dir, rename).
 *
 * On a real cluster the same layout works per-partition: each stage's
 * output is a partitioned Parquet/Iceberg table whose commit manifest
 * records input fingerprints; Spark's task-level retry handles intra-stage
 * partition failures, the manifest handles job-level resume.
 */
object lineage {

  final case class Manifest(fingerprint: String, rows: Long)

  private def manifestPath(dir: String) = Paths.get(dir, "_GRAFT_MANIFEST.json")

  def readManifest(dir: String): Option[Manifest] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val fp = "\"fingerprint\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(s).map(_.group(1))
      val rows = "\"rows\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong)
      for (f <- fp; r <- rows) yield Manifest(f, r)
    }
  }

  def writeManifest(dir: String, m: Manifest): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(manifestPath(dir),
      s"""{"fingerprint":"${m.fingerprint}","rows":${m.rows}}""".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  def fingerprint(parts: String*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(p => md.update(p.getBytes(StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  /**
   * Run `build` for stage `name` unless a matching manifest already covers
   * it; either way return the stage's materialized DataFrame. `inputsFp`
   * should combine the fingerprints (or seeds/config strings) of everything
   * the stage reads.
   *
   * Publication is atomic as documented: the output is written to a tmp
   * dir and renamed into place, and the manifest (written last) records
   * the row count, which is REVALIDATED on reuse — a mismatch (partial
   * data from a crash mid-publish) forces a rebuild instead of silently
   * resuming from truncated output.
   */
  def stage(spark: SparkSession, rootDir: String, name: String,
            inputsFp: String)(build: => DataFrame): DataFrame = {
    val dir = s"$rootDir/$name"
    val fp = fingerprint(name, inputsFp)
    val dataPath = Paths.get(dir, "data")
    val reuse = readManifest(dir).filter(_.fingerprint == fp).flatMap { m =>
      if (!Files.exists(dataPath)) None
      else {
        val out = spark.read.parquet(s"$dir/data")
        // metadata-only count (parquet row-group stats) — cheap revalidation
        if (out.count() == m.rows) Some(out) else None
      }
    }
    reuse.getOrElse {
      val df = build
      val tmp = Paths.get(dir, s"data.tmp")
      deleteRecursively(tmp)
      df.write.mode("overwrite").parquet(tmp.toString)
      deleteRecursively(dataPath)
      Files.move(tmp, dataPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val out = spark.read.parquet(s"$dir/data")
      writeManifest(dir, Manifest(fp, out.count()))
      out
    }
  }
}
