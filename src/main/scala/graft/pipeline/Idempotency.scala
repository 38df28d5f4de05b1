package graft.pipeline

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}

/** Idempotent pipeline runs: SHA-256 key from a canonicalised payload +
  * a file-ledger check-and-set.
  *
  * Reference: src/pipeline/utils/idempotency.py:84 (`generate_key`),
  * :111-115 (SHA-256 over sorted payload), :223 (`check_and_set` via
  * Redis SET NX). The cluster-scale analogue of Redis SET NX is an
  * exclusive ledger-file create on shared storage, which is why this
  * speaks the Hadoop FileSystem API: point `dir` at `hdfs://...` and
  * create-exclusive is atomic across a 1000-executor cluster's drivers;
  * a bare local path gives the same semantics on one machine. (On
  * eventually-consistent object stores use a real lock service instead.) */
class IdempotencyLedger(dir: String,
                        hadoopConf: Configuration = new Configuration(),
                        ttlDays: Option[Int] = None) {
  private val root = new Path(dir)
  private val fs: FileSystem = root.getFileSystem(hadoopConf)
  fs.mkdirs(root)

  require(ttlDays.forall(_ > 0), "ttlDays must be positive when set")

  /** Deterministic key: SHA-256 over "k=v" pairs sorted by key
    * (reference canonicalises with sorted json, idempotency.py:111). */
  def keyFor(payload: Map[String, String]): String = {
    val canonical = payload.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n")
    sha256Hex(canonical)
  }

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Atomically claim `key`: true if this caller acquired it (run should
    * proceed), false if some run already holds it (skip — reference
    * `check_and_set`, idempotency.py:223).
    *
    * TTL semantics (reference: every Redis key is SET with
    * `IDEMPOTENCY_KEY_TTL_DAYS` expiry, idempotency.py:158-168 `setex`
    * — a run older than the TTL stops suppressing re-execution): when
    * `ttlDays` is set, a held key whose CURRENT claim file is OLDER
    * than the TTL stops blocking and may be re-claimed.
    *
    * A key's claim is GENERATION-VERSIONED: generation 0 lives at
    * `key`, generation n at `key.gN`, and the key's state is decided
    * by the HIGHEST generation present. Reclaiming an expired key is
    * one exclusive create of generation latest+1 — the expired file is
    * never deleted, renamed, or touched, so there is no instant at
    * which a fresh claim is invisible to other drivers. Every race
    * collapses onto atomic exclusive-create: two initial claimants
    * race gen 0; two reclaimers of an expired gen N race gen N+1; a
    * STALE reclaimer (its listing predates a racer's reclaim) targets
    * a generation that already exists and loses the create. The
    * delete-based and rename-tombstone reclaim designs both fail here
    * — a stale-decided delete removes the winner's fresh claim, and a
    * stale-decided rename opens a no-file window a third claimant
    * slips through (both observed as 2 winners in the 8-thread race
    * spec). Superseded generations are retained (tiny files, audit
    * trail); only `clear` removes them, and correctness never depends
    * on their absence because the highest generation decides. */
  def checkAndSet(key: String, value: String = ""): Boolean = {
    // HDFS resolves create(overwrite=false) atomically at the namenode,
    // but Hadoop's LOCAL filesystem implements it as exists()-then-create
    // — a TOCTOU hole under which N concurrent drivers on one machine
    // can ALL win the "exclusive" create (observed in the race spec: 6/8
    // claimants succeeded). Local paths therefore claim through NIO's
    // CREATE_NEW (O_CREAT|O_EXCL — atomic at the syscall), remote
    // filesystems through the Hadoop API.
    def claimAt(g: Int): Boolean = {
      val p = genPath(key, g)
      if (fs.getScheme == "file")
        try {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(p.toUri.getPath),
            value.getBytes(StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      else try {
        val out = fs.create(p, false) // overwrite=false -> exclusive
        try out.write(value.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.PathExistsException => false
        case e: java.io.IOException if e.getMessage != null &&
          e.getMessage.contains("already exists") => false
      }
    }
    val ttlMs = ttlDays.map(_.toLong * 24 * 60 * 60 * 1000)
    generations(key).lastOption match {
      case None => claimAt(0)
      case Some((g, st)) =>
        val expired = ttlMs.exists(limit =>
          System.currentTimeMillis() - st.getModificationTime > limit)
        if (expired) claimAt(g + 1) else false
    }
  }

  private def genPath(key: String, g: Int): Path =
    if (g == 0) new Path(root, key) else new Path(root, s"$key.g$g")

  /** All present generations of `key`, ascending. Keys are fixed-width
    * hex, so the `.g*` glob cannot collide with another key — and that
    * documented invariant is ENFORCED here (every public entry point
    * resolves through this method): a caller-supplied key containing
    * glob metacharacters ({, [, *, ?) or path separators would misparse
    * or match unrelated ledger files, so it is rejected loudly. */
  private def generations(key: String)
      : Seq[(Int, org.apache.hadoop.fs.FileStatus)] = {
    require(key.nonEmpty && key.forall(c =>
        ('0' <= c && c <= '9') || ('a' <= c && c <= 'f')),
      s"idempotency keys must be lowercase hex (use keyFor), got: $key")
    val plain =
      try Seq((0, fs.getFileStatus(new Path(root, key))))
      catch { case _: java.io.FileNotFoundException => Nil }
    val more = Option(fs.globStatus(new Path(root, key + ".g*")))
      .map(_.toSeq).getOrElse(Nil)
      .flatMap { st =>
        st.getPath.getName.stripPrefix(key + ".g").toIntOption.map((_, st))
      }
    (plain ++ more).sortBy(_._1)
  }

  def isSet(key: String): Boolean = generations(key).nonEmpty

  def get(key: String): Option[String] =
    generations(key).lastOption.map { case (_, st) =>
      val in = fs.open(st.getPath)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    }

  def clear(key: String): Unit =
    generations(key).foreach { case (_, st) => fs.delete(st.getPath, false) }
}
