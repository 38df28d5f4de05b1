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
    * `ttlDays` is set, a held key whose ledger file is OLDER than the
    * TTL is reclaimed and re-claimed with one more exclusive create.
    *
    * Reclaim is an atomic RENAME to a unique tombstone, never a delete
    * of the live key path: a delete decided against a stale mtime could
    * remove a racing winner's FRESH claim (both racers then "win" and
    * the pipeline runs twice — the exact failure the ledger exists to
    * prevent). rename(src, dst) fails for the second racer because the
    * source is gone, so at most one driver moves the expired file
    * aside; everyone else falls through to the exclusive create, which
    * admits exactly one claimant. A rename that turns out to have moved
    * a non-expired file (this driver's stat was stale — another driver
    * already reclaimed and re-created between our stat and rename) is
    * rolled back and the reclaim is abandoned: the key is legitimately
    * held. The live key path is thus only ever created exclusively or
    * renamed-if-expired — never unconditionally deleted. */
  def checkAndSet(key: String, value: String = ""): Boolean = {
    // HDFS resolves create(overwrite=false) atomically at the namenode,
    // but Hadoop's LOCAL filesystem implements it as exists()-then-create
    // — a TOCTOU hole under which N concurrent drivers on one machine
    // can ALL win the "exclusive" create (observed in the race spec: 6/8
    // claimants succeeded). Local paths therefore claim through NIO's
    // CREATE_NEW (O_CREAT|O_EXCL — atomic at the syscall), remote
    // filesystems through the Hadoop API.
    def claim(): Boolean =
      if (fs.getScheme == "file")
        try {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(new Path(root, key).toUri.getPath),
            value.getBytes(StandardCharsets.UTF_8),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      else try {
        val out = fs.create(new Path(root, key), false) // overwrite=false -> exclusive
        try out.write(value.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.PathExistsException => false
        case e: java.io.IOException if e.getMessage != null &&
          e.getMessage.contains("already exists") => false
      }
    val ttlMs = ttlDays.map(_.toLong * 24 * 60 * 60 * 1000)
    def ageMs(p: Path): Option[Long] =
      try Some(System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime)
      catch { case _: java.io.FileNotFoundException => None }
    claim() || (ttlMs match {
      case Some(limit) =>
        val p = new Path(root, key)
        ageMs(p) match {
          case None => claim() // raced clear: key vanished, create decides
          case Some(age) if age <= limit => false // held and fresh
          case Some(_) =>
            val tomb = new Path(root,
              s".reclaim.$key.${java.util.UUID.randomUUID().toString}")
            val renamed =
              try fs.rename(p, tomb)
              catch { case _: java.io.IOException => false }
            if (!renamed) claim() // lost the reclaim race; create decides
            else if (ageMs(tomb).forall(_ > limit)) {
              // we moved a genuinely expired file: retire it and re-claim
              fs.delete(tomb, false)
              claim()
            } else {
              // stale stat: the file we moved was a racing winner's FRESH
              // claim — restore it and back off. If the restore target was
              // re-created in the meantime some claimant already holds a
              // fresh key, so dropping the tombstone preserves exclusivity
              // (the exists() pre-check matters on local FS, where rename
              // silently overwrites an existing destination).
              if (fs.exists(p) || !fs.rename(tomb, p)) fs.delete(tomb, false)
              false
            }
        }
      case None => false
    })
  }

  def isSet(key: String): Boolean = fs.exists(new Path(root, key))

  def get(key: String): Option[String] = {
    val p = new Path(root, key)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  def clear(key: String): Unit = fs.delete(new Path(root, key), false)
}
