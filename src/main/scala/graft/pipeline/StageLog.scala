package graft.pipeline

/** Structured per-stage pipeline logging — the Spark-native form of the
  * reference's JSON-context logger (src/pipeline/utils/logging.py:
  * `StructuredFormatter` emits one JSON object per event with
  * pipeline/task context fields attached). Here each pipeline run emits
  * one compact JSON line per event (`pipeline_start`, `stage_complete`,
  * `pipeline_complete`, `pipeline_skipped`) through a swappable sink
  * that defaults to the slf4j logger Spark's log4j config already
  * routes. One line per STAGE, not per row or task — at 100 TB the log
  * volume tracks the pipeline's shape, never its data; the durable
  * queryable copy of the same facts is [[RunLedger]] (this is the
  * operational tail -f view, the ledger is the audit table).
  *
  * The sink is process-global and swappable so tests (and embedding
  * applications that want their own log pipeline) can capture lines
  * without reconfiguring log4j. */
object StageLog {
  private val logger = org.slf4j.LoggerFactory.getLogger("graft.pipeline")

  @volatile var sink: String => Unit = s => logger.info(s)

  /** Correlation-id CONTEXT — the reference's contextvar-based
    * correlation id (logging.py:179-199: `get/set_correlation_id`, the
    * StructuredFormatter stamps it on every record) re-expressed as an
    * inheritable thread-local: once set, EVERY line [[emit]] produces
    * carries `correlation_id` without callers threading it by hand,
    * and child threads (Spark's driver-side action threads) inherit
    * it. A caller that spans several pipeline runs (a scheduler
    * submitting a request) sets one id around the batch; [[Pipeline]]
    * installs the run id as the correlation id only when none is
    * already in context, so request-scoped ids survive nesting.
    *
    * LIMIT (r17 ADVICE) — inheritance is CREATION-time-only, unlike
    * the reference's contextvars which propagate per logical context:
    * a long-lived pooled thread captures whatever id was in scope when
    * the pool first spawned it and keeps it until reset, so an [[emit]]
    * from a REUSED shared-pool thread (a streaming listener, a cached
    * ForkJoinPool worker) can stamp a later run's lines with an earlier
    * run's id. Emit sites that run on shared pools must therefore
    * either pass `correlation_id` explicitly in `fields` (explicit
    * fields always win over the context — [[emit]] checks) or re-enter
    * [[withCorrelationId]] on the pool thread. [[Pipeline]] itself
    * always emits on the thread that called `run`, inside its own
    * `withCorrelationId` span, so pipeline lines are never stale; and
    * job-level attribution rides the `graft.correlation.id` Spark
    * local property ([[Pipeline]] sets it around each run)
    * independently of this context. */
  private val correlation = new InheritableThreadLocal[String]

  /** The correlation id currently in context, if any. */
  def correlationId: Option[String] = Option(correlation.get())

  /** Run `body` with `id` as the context correlation id, restoring the
    * previous context on exit (exception- and early-return-safe). */
  def withCorrelationId[T](id: String)(body: => T): T = {
    val prev = correlation.get()
    correlation.set(id)
    try body finally correlation.set(prev)
  }

  /** Compact single-line JSON with full string escaping (same rules as
    * Verify's dump: a stray newline/quote in a path or an error message
    * must never split or corrupt a log line). Longs/doubles/booleans
    * pass through as JSON scalars; everything else is quoted. */
  def line(event: String, fields: (String, Any)*): String = {
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def v(x: Any): String = x match {
      case null => "null"
      case b: Boolean => b.toString
      case n: Byte => n.toString
      case n: Short => n.toString
      case n: Int => n.toString
      case n: Long => n.toString
      case n: Double => if (n.isNaN || n.isInfinite) esc(n.toString) else n.toString
      case n: Float => v(n.toDouble)
      case other => esc(other.toString)
    }
    (("event" -> event) +: fields)
      .map { case (k, x) => s"${esc(k)}: ${v(x)}" }
      .mkString("{", ", ", "}")
  }

  def emit(event: String, fields: (String, Any)*): Unit = {
    val withCid = correlationId match {
      case Some(cid) if !fields.exists(_._1 == "correlation_id") =>
        fields :+ ("correlation_id" -> (cid: Any))
      case _ => fields
    }
    sink(line(event, withCid: _*))
  }
}
