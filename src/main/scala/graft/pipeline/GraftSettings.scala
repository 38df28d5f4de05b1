package graft.pipeline

/** Env-driven settings layer — the one place a DEPLOYMENT configures
  * graft, so a scheduled `spark-submit --class graft.PipelineCli` run
  * can be pointed at its ledgers and tuned without editing flags into
  * every invocation.
  *
  * Reference: src/pipeline/config/settings.py:1-185 — a single
  * `Settings` object where every knob (DB URLs, TTLs, retry/backoff,
  * pool sizes, log level) is an env variable with a validated default.
  * The Spark re-expression keeps the shape (env + default + loud
  * validation) and maps the knobs that exist in a Spark library:
  * broker/worker/pool settings have no analog (YARN/K8s owns executor
  * inventory; JDBC connections are per-partition), while the ledger
  * directories — which the reference keeps in Postgres/Redis URLs —
  * become filesystem paths.
  *
  * Precedence, enforced by [[graft.PipelineCli]] and spec-pinned:
  * explicit flag > environment variable > default. All variables:
  *
  *   GRAFT_LEDGER_DIR             run-stats ledger directory
  *   GRAFT_IDEMPOTENCY_DIR        idempotency-claim ledger directory
  *   GRAFT_IDEMPOTENCY_TTL_DAYS   claim TTL (int; reference
  *                                IDEMPOTENCY_KEY_TTL_DAYS default 7 —
  *                                here unset = never expire, matching
  *                                IdempotencyLedger's default)
  *   GRAFT_IDEMPOTENCY_ENABLED    "true"/"false" (default true): false
  *                                ignores GRAFT_IDEMPOTENCY_DIR — runs
  *                                execute unconditionally
  *   GRAFT_MAX_RETRIES            driver-side retry attempts (default 3)
  *   GRAFT_RETRY_BASE_DELAY_MS    first backoff delay (default 100)
  *   GRAFT_RETRY_BACKOFF          backoff multiplier (default 2.0)
  *   GRAFT_JDBC_NUM_PARTITIONS    default JDBC write parallelism (8)
  *   GRAFT_JDBC_BATCH_SIZE        JDBC writer batch size (1000)
  *   GRAFT_LOG_LEVEL              Spark log level (default WARN;
  *                                validated against log4j levels)
  */
final case class GraftSettings(
    ledgerDir: Option[String],
    idempotencyDir: Option[String],
    idempotencyTtlDays: Option[Int],
    idempotencyEnabled: Boolean,
    maxRetries: Int,
    retryBaseDelayMs: Long,
    retryBackoff: Double,
    jdbcNumPartitions: Int,
    jdbcBatchSize: Int,
    logLevel: String) {

  /** The run-stats ledger this deployment writes, if configured. */
  def runLedger: Option[RunLedger] = ledgerDir.map(new RunLedger(_))

  /** The idempotency ledger this deployment claims through — None when
    * disabled, regardless of a configured directory. */
  def idempotencyLedger: Option[IdempotencyLedger] =
    if (!idempotencyEnabled) None
    else idempotencyDir.map(new IdempotencyLedger(_, ttlDays = idempotencyTtlDays))
}

object GraftSettings {

  private val LogLevels =
    Set("ALL", "DEBUG", "ERROR", "FATAL", "INFO", "OFF", "TRACE", "WARN")

  /** Defaults with no environment applied. */
  val defaults: GraftSettings = GraftSettings(
    ledgerDir = None,
    idempotencyDir = None,
    idempotencyTtlDays = None,
    idempotencyEnabled = true,
    maxRetries = 3,
    retryBaseDelayMs = 100L,
    retryBackoff = 2.0,
    jdbcNumPartitions = 8,
    jdbcBatchSize = 1000,
    logLevel = "WARN")

  /** Settings from an environment map (default: the process env).
    * Malformed values fail LOUDLY with the variable name — a deployment
    * typo must not silently run with the default. */
  def fromEnv(env: Map[String, String] = sys.env): GraftSettings = {
    def parsed[A](name: String, parse: String => Option[A], kind: String)
        : Option[A] =
      env.get(name).map { raw =>
        parse(raw).getOrElse(throw new IllegalArgumentException(
          s"$name must be $kind, got: '$raw'"))
      }
    def int(name: String) = parsed(name, _.toIntOption, "an integer")
    def long(name: String) = parsed(name, _.toLongOption, "an integer")
    def double(name: String) = parsed(name, _.toDoubleOption, "a number")
    def bool(name: String) = parsed(name,
      s => s.toLowerCase match {
        case "true" | "1" | "yes" => Some(true)
        case "false" | "0" | "no" => Some(false)
        case _ => None
      }, "true/false")
    val level = env.get("GRAFT_LOG_LEVEL").map(_.toUpperCase)
    level.foreach(l => require(LogLevels.contains(l),
      s"GRAFT_LOG_LEVEL must be one of ${LogLevels.toSeq.sorted.mkString("/")}, got: '$l'"))
    GraftSettings(
      ledgerDir = env.get("GRAFT_LEDGER_DIR"),
      idempotencyDir = env.get("GRAFT_IDEMPOTENCY_DIR"),
      idempotencyTtlDays = int("GRAFT_IDEMPOTENCY_TTL_DAYS"),
      idempotencyEnabled = bool("GRAFT_IDEMPOTENCY_ENABLED")
        .getOrElse(defaults.idempotencyEnabled),
      maxRetries = int("GRAFT_MAX_RETRIES").getOrElse(defaults.maxRetries),
      retryBaseDelayMs = long("GRAFT_RETRY_BASE_DELAY_MS")
        .getOrElse(defaults.retryBaseDelayMs),
      retryBackoff = double("GRAFT_RETRY_BACKOFF").getOrElse(defaults.retryBackoff),
      jdbcNumPartitions = int("GRAFT_JDBC_NUM_PARTITIONS")
        .getOrElse(defaults.jdbcNumPartitions),
      jdbcBatchSize = int("GRAFT_JDBC_BATCH_SIZE").getOrElse(defaults.jdbcBatchSize),
      logLevel = level.getOrElse(defaults.logLevel))
  }
}
