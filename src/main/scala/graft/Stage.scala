package graft

import org.apache.spark.sql.DataFrame

/** Oracle staging: parquet hand-off from the Spark engine to the DuckDB
  * correctness oracle.
  *
  * Some operators hinge on an engine-specific primitive the oracle engine
  * cannot reproduce (xxhash64 signatures, k-means centroids, LSH
  * hyperplane signs). Their DOWNSTREAM logic — banding, window-min
  * selection, candidate pairing, top-k ranking — is plain relational
  * algebra, fully expressible in DuckDB SQL. So the query stages the
  * engine-specific intermediate to parquet here, and the oracle SQL reads
  * it back (`read_parquet`) and recomputes the downstream logic
  * independently: the mechanism under test is everything AFTER the staged
  * hand-off, which is exactly the part a port to another engine would
  * need to get right.
  *
  * The staging directory is keyed by the scale-factor directory name so a
  * bench run at sf0.1 cannot clobber the intermediates a Verify run at
  * sf0.01 staged for its oracle pass. Oracle SQL references the directory
  * via [[placeholder]]; `Verify` substitutes the actual path for the sf it
  * runs (the oracle consumer executes the SQL as written, so the
  * substitution must happen where the sf is known).
  */
object Stage {

  /** Literal token oracle SQL embeds where the staging dir belongs. */
  val placeholder = "__GRAFT_STAGE_DIR__"

  /** Staging only happens under the Verify runner (which [[enable]]s it):
    * the staged dumps exist solely for the DuckDB oracle, so Bench and
    * PlanAudit runs of the same queries skip the writes — the timed/
    * audited plan is the operator itself. The dumped frame and the query
    * result derive from the same persisted intermediate, so the oracle
    * still sees exactly the data the result was computed from.
    */
  def enabled: Boolean = sys.props.get("graft.stage.enabled").contains("1")

  def enable(): Unit = sys.props("graft.stage.enabled") = "1"

  /** Staging dir for one (corpus, JVM) pair: keyed by a hash of the FULL
    * absolute sf path (two corpora whose paths merely share a basename get
    * distinct dirs) plus this JVM's pid (two concurrent Verify runs at the
    * same sf cannot read each other's intermediates). The oracle never
    * recomputes this path — Verify substitutes the resolved absolute path
    * into oracle_sql.json at dump time, in the same JVM that staged.
    */
  def dir(sfDir: String): String = {
    val abs = new java.io.File(sfDir).getAbsolutePath
    val sfName = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_")
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val pid = ProcessHandle.current().pid()
    s"${sys.props("java.io.tmpdir")}/graft-stage-$sfName-$hash-$pid"
  }

  /** Overwrite-write `df` as the staged intermediate `name` for this sf.
    * `df` is by-name: when staging is disabled it is never even built, so
    * staging-only frames (e.g. LSH bucket exports) cost nothing outside
    * Verify.
    */
  def write(df: => DataFrame, sfDir: String, name: String): Unit =
    if (enabled) df.write.mode("overwrite").parquet(s"${dir(sfDir)}/$name")

  /** `read_parquet` reference for oracle SQL (placeholder substituted by
    * Verify at dump time).
    */
  def sqlRef(name: String): String =
    s"read_parquet('$placeholder/$name/*.parquet')"
}
