package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the harness mains and tests.
  *
  * All engine-relevant confs live here, at session construction — no
  * loader or operator mutates session state:
  *  - shuffle partitions sized to the local core count (not the 200
  *    default) so sf-scale local runs don't fragment; on a real cluster
  *    this would be AQE-advised / `spark.sql.shuffle.partitions` tuned
  *    to executor count;
  *  - UTC session timezone (all reference date math is naive
  *    `yyyy-MM-dd`);
  *  - `nanosAsLong` kept for fixture-schema robustness: some rounds
  *    ship `events.ts` as TIMESTAMP(NANOS), which only reads (as exact
  *    int64 nanoseconds) under this conf; current fixtures are
  *    TIMESTAMP(MICROS), where the conf is a no-op and [[Tables.events]]
  *    normalizes the timestamp back to the ns-long contract.
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Harness-main session: `SPARK_GRAFT_CPUS` override, else the
    * contract runtime (local[32]) capped by the actual core count —
    * a bare `runMain graft.Bench` must bench at full parallelism, not
    * a conservative default.
    */
  def fromEnv(): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString))
}
