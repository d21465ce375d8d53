package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory: every entry point (Verify, Bench, tests,
  * dev tools) builds its session here so the engine's extensions
  * ([[graft.plans.GraftExtensions]] — native expressions) and baseline
  * configs are installed consistently. */
object Engine {
  def session(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local-mode only: skip the per-file chmod fork + .crc sidecar of
      // Hadoop's default local FS (see graft.io.BareLocalFileSystem —
      // measured 14.3 s → sub-second for a 1000-dir sharded dump)
      .config("spark.hadoop.fs.file.impl",
        classOf[io.BareLocalFileSystem].getName)
      .withExtensions(new plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
