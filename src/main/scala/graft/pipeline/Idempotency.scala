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
    * TTL is reclaimed — deleted and re-claimed with one more exclusive
    * create. Two drivers racing an expired key both delete (idempotent)
    * and then race the create; exclusive-create lets exactly one win,
    * and the loser sees the winner's FRESH file and backs off. */
  def checkAndSet(key: String, value: String = ""): Boolean = {
    def claim(): Boolean =
      try {
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
    claim() || (ttlDays match {
      case Some(days) =>
        val p = new Path(root, key)
        val expired =
          try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime >
            days.toLong * 24 * 60 * 60 * 1000
          catch { case _: java.io.FileNotFoundException => true } // raced clear
        if (expired) { fs.delete(p, false); claim() } else false
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
