package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.store.TableStore

/** S9: database source/sink with automatic backend selection — the
  * Spark-first re-expression of the reference's storage layer
  * (`/root/reference/src/storage/database.py:35-89`):
  *
  *  - `AWS_RDS_HOST` + `AWS_RDS_PASSWORD` set → PostgreSQL over
  *    Spark's JDBC source (partitioned parallel reads, predicate
  *    pushdown), connecting with the reference's linear-backoff
  *    retry: 3 attempts, 30 s·attempt between them, last failure
  *    rethrown.
  *  - otherwise → the engine's [[TableStore]] parquet tables — the
  *    development fallback, playing the exact role SQLite plays in
  *    the reference (a local store needing no credentials), but
  *    scan-parallel and schema-stable instead of single-file.
  *
  * The selection and retry cores are pure functions over an injected
  * environment / connector, so they are fully offline-testable
  * (DbSourceSpec); only the live PostgreSQL handshake is environment-
  * dependent, exactly like [[ApiClient]]'s live HTTP half.
  */
object DbSource {

  final case class PgConfig(
      host: String,
      port: Int,
      database: String,
      user: String,
      password: String) {
    /** `sslmode=require` mirrors the reference's `ssl_context=True`. */
    def url: String =
      s"jdbc:postgresql://$host:$port/$database?sslmode=require"
  }

  sealed trait Backend
  final case class Postgres(cfg: PgConfig) extends Backend
  final case class LocalStore(root: String) extends Backend

  /** Reference autoselect contract (`database.py:36-39`): Postgres
    * only when BOTH host and password are present; every other
    * combination falls back to the local store. Port/dbname/user
    * default like the reference's env defaults.
    */
  def chooseBackend(
      env: String => Option[String],
      localRoot: String = "data/store"): Backend =
    (env("AWS_RDS_HOST"), env("AWS_RDS_PASSWORD")) match {
      case (Some(host), Some(pw)) =>
        Postgres(PgConfig(
          host,
          env("AWS_RDS_PORT").getOrElse("5432").toInt,
          env("AWS_RDS_DBNAME").getOrElse("postgres"),
          env("AWS_RDS_USER").getOrElse("postgres"),
          pw))
      case _ => LocalStore(localRoot)
    }

  /** Linear-backoff connect retry (`database.py:55-78`): attempt
    * 1..maxRetries, sleeping 30 s × attempt between failures; the
    * final failure rethrows (a batch run must fail loudly, not limp
    * on without a store). `sleep` injectable for specs.
    */
  def connectWithRetry[A](
      connect: () => A,
      maxRetries: Int = 3,
      backoffMsPerAttempt: Long = 30000L,
      sleep: Long => Unit = Thread.sleep): A = {
    require(maxRetries >= 1)
    var attempt = 1
    var out: Option[A] = None
    while (out.isEmpty) {
      try out = Some(connect())
      catch {
        // NonFatal only: a VM error or thread interrupt must
        // propagate immediately, not trigger 30/60 s blind retries
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxRetries) throw e
          sleep(backoffMsPerAttempt * attempt)
          attempt += 1
      }
    }
    out.get
  }

  /** Read `table` from the selected backend, with a schema to apply
    * when the local table does not exist yet: a fresh store then
    * behaves like an EMPTY TYPED table — column references resolve,
    * joins/unions line up — mirroring the reference's fresh-SQLite
    * path, where `initialize_schema()` gives an absent table its DDL
    * columns before the first read (`database.py` / `schema.sql`).
    */
  def read(
      spark: SparkSession,
      backend: Backend,
      table: String,
      schemaIfAbsent: org.apache.spark.sql.types.StructType): DataFrame =
    backend match {
      case LocalStore(root) =>
        new TableStore(spark, root).read(table)
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            schemaIfAbsent))
      case pg => read(spark, pg, table)
    }

  /** Read `table` from the selected backend. The Postgres arm wraps
    * Spark's JDBC source in the retry loop (the load() handshake is
    * the connect); the local arm reads the parquet table, empty-frame
    * on absence (the reference's fresh-SQLite-file behavior).
    * NOTE the absent-table frame is SCHEMA-LESS (zero columns):
    * callers that will reference columns on a possibly-absent table
    * must use the `schemaIfAbsent` overload above, which returns an
    * empty typed table instead.
    */
  def read(spark: SparkSession, backend: Backend, table: String): DataFrame =
    backend match {
      case Postgres(cfg) =>
        connectWithRetry(() =>
          spark.read.format("jdbc")
            .option("url", cfg.url)
            .option("dbtable", table)
            .option("user", cfg.user)
            .option("password", cfg.password)
            .option("connectTimeout", "30") // reference's timeout=30
            .load())
      case LocalStore(root) =>
        new TableStore(spark, root).read(table)
          .getOrElse(spark.emptyDataFrame)
    }

  /** Write (overwrite) `df` as `table` on the selected backend. */
  def write(
      spark: SparkSession,
      backend: Backend,
      table: String,
      df: DataFrame): Unit =
    backend match {
      case Postgres(cfg) =>
        connectWithRetry { () =>
          df.write.format("jdbc")
            .option("url", cfg.url)
            .option("dbtable", table)
            .option("user", cfg.user)
            .option("password", cfg.password)
            .mode("overwrite")
            .save()
        }
      case LocalStore(root) =>
        new TableStore(spark, root).write(table, df)
    }
}
