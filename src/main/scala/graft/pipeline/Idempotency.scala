package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.security.MessageDigest

/** Idempotent pipeline runs: SHA-256 key from a canonicalised payload +
  * a file-ledger check-and-set.
  *
  * Reference: src/pipeline/utils/idempotency.py:84 (`generate_key`),
  * :111-115 (SHA-256 over sorted payload), :223 (`check_and_set` via
  * Redis SET NX). The Spark-native analogue of Redis SET NX is an atomic
  * ledger-file create (CREATE_NEW) on shared storage — same
  * compare-and-set semantics, no extra service. */
class IdempotencyLedger(dir: String) {
  private val root: Path = Paths.get(dir)
  Files.createDirectories(root)

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
    * `check_and_set`, idempotency.py:223). */
  def checkAndSet(key: String, value: String = ""): Boolean =
    try {
      Files.write(root.resolve(key), value.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }

  def isSet(key: String): Boolean = Files.exists(root.resolve(key))

  def get(key: String): Option[String] =
    if (isSet(key)) Some(new String(Files.readAllBytes(root.resolve(key)), StandardCharsets.UTF_8))
    else None

  def clear(key: String): Unit = Files.deleteIfExists(root.resolve(key))
}
