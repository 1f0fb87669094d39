package graft.engine

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Engine configuration with environment-variable support — the Spark
  * analog of the reference's pydantic `Settings`
  * (vector_db/config.py:11-47): every knob has a default, can be set in a
  * `.env` file, overridden by a process environment variable, and
  * overridden again by explicit caller values — the same precedence
  * (init args > env > .env > defaults) `BaseSettings` applies.
  *
  * The reference's server knobs (host/port) have no Spark meaning and are
  * intentionally absent (the REST layer is out of scope — BASELINE.json);
  * in their place sit the knobs a Spark deployment actually turns:
  * default probe mode, the adaptive candidate budget, and the
  * filtered-probe histogram-collect bound.
  *
  * @param storageType "memory" (fresh in-memory engine) or "disk"
  *                    (`VectorEngine.boot` reopens `stateDir` when it
  *                    holds saved state, creates it otherwise) —
  *                    config.py storage_type.
  * @param stateDir    the persistence directory (config.py data_dir;
  *                    default ./data). `VectorEngine.save()` with no
  *                    argument writes here.
  * @param defaultProbe       LSH probe mode `search`/`searchBatch` use
  *                           when the caller passes none.
  * @param adaptiveMultiplier default adaptive candidate budget (x k).
  * @param maxAdaptiveHistBuckets bound on the driver-collected allow-set
  *                           histogram of a FILTERED adaptive search;
  *                           wider histograms fall back to multi-probe.
  * @param logLevel    optional Spark log level (config.py log_level);
  *                    Python level names (WARNING/CRITICAL) are mapped.
  */
final case class GraftSettings(
    storageType: String,
    stateDir: String,
    defaultProbe: String,
    adaptiveMultiplier: Int,
    maxAdaptiveHistBuckets: Int,
    logLevel: Option[String]) {

  /** Create the state directory if missing (config.py ensure_data_dir —
    * only meaningful for disk storage, like the reference). */
  def ensureStateDir(): Unit =
    if (storageType == GraftSettings.StorageDisk)
      Files.createDirectories(Paths.get(stateDir))

  /** Apply the configured log level to the session's SparkContext
    * (config.py configure_logging). */
  def configureLogging(spark: org.apache.spark.sql.SparkSession): Unit =
    logLevel.foreach(l => spark.sparkContext.setLogLevel(l))
}

object GraftSettings {

  val StorageMemory = "memory"
  val StorageDisk = "disk"

  val EnvStorageType = "GRAFT_STORAGE_TYPE"
  val EnvStateDir = "GRAFT_STATE_DIR"
  val EnvDefaultProbe = "GRAFT_DEFAULT_PROBE"
  val EnvAdaptiveMultiplier = "GRAFT_ADAPTIVE_MULTIPLIER"
  val EnvMaxHistBuckets = "GRAFT_MAX_HIST_BUCKETS"
  val EnvLogLevel = "GRAFT_LOG_LEVEL"

  /** All defaults, no environment consulted. */
  val Defaults: GraftSettings = GraftSettings(
    storageType = StorageMemory,
    stateDir = "./data",
    defaultProbe = VectorEngine.ProbeAdaptive,
    adaptiveMultiplier = graft.operators.LshIndex.AdaptiveMultiplier,
    maxAdaptiveHistBuckets = graft.operators.LshIndex.MaxAdaptiveHistBuckets,
    logLevel = None)

  /** Python logging level names accepted for reference parity and mapped
    * onto log4j's. */
  private val LevelAliases =
    Map("WARNING" -> "WARN", "CRITICAL" -> "FATAL")
  private val ValidLevels =
    Set("ALL", "TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL", "OFF")

  /** Parse a `.env` file: KEY=VALUE lines, `#` comments and blanks
    * ignored, optional surrounding quotes stripped (the subset of dotenv
    * the reference relies on — config.py model_config env_file). A
    * missing file is simply empty, as in pydantic. */
  def parseEnvFile(path: Path): Map[String, String] =
    if (!Files.isRegularFile(path)) Map.empty
    else Files.readAllLines(path).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        val v = l.substring(i + 1).trim
        val unquoted =
          if (v.length >= 2 &&
              ((v.head == '"' && v.last == '"') ||
               (v.head == '\'' && v.last == '\''))) v.substring(1, v.length - 1)
          else v
        l.substring(0, i).trim -> unquoted
      }
      .toMap

  /** Load settings with the reference's precedence: explicit `overrides`
    * beat process `env`, which beats the `.env` file, which beats
    * defaults. Every value is validated — a bad probe mode or a
    * non-positive budget fails at LOAD time, not first search. */
  def load(env: Map[String, String] = sys.env,
           envFile: Option[Path] = Some(Paths.get(".env")),
           overrides: Map[String, String] = Map.empty): GraftSettings = {
    val fileVals = envFile.map(parseEnvFile).getOrElse(Map.empty)
    // A key SET to an empty value is not "unset": silently treating it as
    // absent would both mask a valid lower-precedence value (env "" hiding
    // a good .env entry) and bypass validation — it flows through and
    // fails the field's check loudly instead.
    def get(key: String): Option[String] =
      overrides.get(key).orElse(env.get(key)).orElse(fileVals.get(key))
        .map(_.trim)
    def getInt(key: String): Option[Int] = get(key).map { v =>
      try v.toInt
      catch { case _: NumberFormatException =>
        throw ValidationError(s"$key must be an integer, got '$v'") }
    }
    val storage = get(EnvStorageType).getOrElse(Defaults.storageType)
    if (storage != StorageMemory && storage != StorageDisk)
      throw ValidationError(
        s"$EnvStorageType must be '$StorageMemory' or '$StorageDisk', got '$storage'")
    val probe = get(EnvDefaultProbe).getOrElse(Defaults.defaultProbe)
    if (!VectorEngine.SupportedProbes(probe))
      throw ValidationError(s"$EnvDefaultProbe: unknown probe mode '$probe'")
    val mult = getInt(EnvAdaptiveMultiplier).getOrElse(Defaults.adaptiveMultiplier)
    if (mult <= 0) throw ValidationError(s"$EnvAdaptiveMultiplier must be > 0")
    val cap = getInt(EnvMaxHistBuckets).getOrElse(Defaults.maxAdaptiveHistBuckets)
    if (cap <= 0) throw ValidationError(s"$EnvMaxHistBuckets must be > 0")
    val level = get(EnvLogLevel).map { raw =>
      val up = raw.toUpperCase
      val mapped = LevelAliases.getOrElse(up, up)
      if (!ValidLevels(mapped))
        throw ValidationError(s"$EnvLogLevel: unknown log level '$raw'")
      mapped
    }
    val stateDir = get(EnvStateDir).getOrElse(Defaults.stateDir)
    if (stateDir.isEmpty)
      throw ValidationError(s"$EnvStateDir must be a non-empty path")
    GraftSettings(storage, stateDir, probe, mult, cap, level)
  }
}
