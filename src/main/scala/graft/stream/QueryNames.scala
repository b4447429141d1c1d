package graft.stream

/** Stable per-instance streaming query names.
  *
  * A FIXED query name ("graft-cdc-pipeline") means two connectors in one
  * SparkSession collide at `start()` ("query with that name is already
  * active") — the reference supports multiple connector instances per
  * process. The suffix is a hash of the checkpoint location: unique per
  * pipeline instance (each has its own checkpoint ≙ replication slot),
  * and STABLE across restarts of the same instance, so dashboards and
  * the metrics listener's name filter keep working after a restart.
  */
object QueryNames {
  def suffix(checkpointDir: String): String =
    Integer.toHexString(checkpointDir.hashCode)

  def cdcPipeline(checkpointDir: String): String =
    s"graft-cdc-pipeline-${suffix(checkpointDir)}"
}
