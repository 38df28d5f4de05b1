package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Durable versioned key-value registry on shared storage.
  *
  * Reference: src/pipeline/transformation/schema_validator.py:259
  * (`register_schema` persists to a DB registry table), :347
  * (`load_schema` reads back in a fresh process), :446
  * (`get_schema_history`); the SQL-transformer query registry
  * (sql_transformer.py:218) persists the same way. The reference's
  * registry is a database table; the cluster-native equivalent is a
  * directory of immutable version files on the shared filesystem — the
  * same storage the 1000-executor cluster already mounts, no extra
  * service, and each version is one atomic `create(overwrite=false)`
  * like the [[IdempotencyLedger]]. Layout:
  *
  * {{{ <dir>/<name>/v<version>.json   // {"payload":..., "description":...} }}}
  *
  * Versions are immutable once written (re-registering an existing
  * version throws — an audit trail, like the reference's history).
  */
class DurableRegistry(dir: String,
                      hadoopConf: Configuration = new Configuration()) {
  private val root = new Path(dir)
  private val fs: FileSystem = root.getFileSystem(hadoopConf)
  fs.mkdirs(root)

  def put(name: String, version: Int, payload: String,
          description: String = ""): Unit = {
    val entry = JsonMethods.compact(JsonMethods.render(
      JObject("payload" -> JString(payload),
              "description" -> JString(description))))
    val p = versionPath(name, version)
    fs.mkdirs(p.getParent)
    val out =
      try fs.create(p, false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"registry version already exists: $name v$version", e)
      }
    try out.write(entry.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def get(name: String, version: Int): Option[String] =
    readEntry(name, version).map(_._1)

  def latestVersion(name: String): Option[Int] = {
    val vs = versions(name)
    if (vs.nonEmpty) Some(vs.max) else None
  }

  def latest(name: String): Option[String] =
    latestVersion(name).flatMap(get(name, _))

  /** All registered versions of `name`, ascending. */
  def versions(name: String): Seq[Int] = {
    val d = new Path(root, name)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .collect { case VersionFile(v) => v.toInt }.sorted
  }

  /** (version, description) pairs, oldest first (reference
    * `get_schema_history` / `get_transformation_history`). */
  def history(name: String): Seq[(Int, String)] =
    versions(name).flatMap(v => readEntry(name, v).map { case (_, d) => (v, d) })

  /** Every name with at least one version. */
  def names(): Seq[String] =
    fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath.getName).sorted

  private val VersionFile = "v(\\d+)\\.json".r

  private def versionPath(name: String, version: Int) =
    new Path(new Path(root, name), s"v$version.json")

  private def readEntry(name: String, version: Int): Option[(String, String)] = {
    val p = versionPath(name, version)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val raw = try {
        val bytes = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      val j = JsonMethods.parse(raw)
      val JString(payload) = (j \ "payload"): @unchecked
      val desc = j \ "description" match { case JString(d) => d; case _ => "" }
      Some((payload, desc))
    }
  }
}
