package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.OrchestratorQueries

/** Manifest-mode CI lane: every orchestrated end-to-end scenario must
  * produce IDENTICAL results whether the engine commits via the rename
  * protocol (local/HDFS) or the manifest protocol (object stores).
  *
  * Why this lane exists: the oracle-checked `MatQueries` family pins
  * `CommitMode.Manifest` explicitly, but `Engine` resolves
  * `CommitMode.Auto` — on the local test filesystem that picks rename,
  * so without this lane the full build lifecycle (compile → DAG → view
  * registration → incremental `{{ this }}` reads → partition-pruned
  * insert_overwrite) would pass through the CAS/pointer-read path only
  * in unit-scoped ManifestCommitSpec scenarios, never end-to-end.
  */
class ManifestLaneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  /** Run `q` with `graft.commit.mode` pinned to `mode`, restoring after. */
  private def inMode(mode: String)(q: => DataFrame): Seq[String] = {
    val prev = sys.props.get("graft.commit.mode")
    sys.props("graft.commit.mode") = mode
    try q.collect().map(_.toString).sorted.toSeq
    finally prev match {
      case Some(v) => sys.props("graft.commit.mode") = v
      case None => sys.props.remove("graft.commit.mode"); ()
    }
  }

  private def laneCheck(name: String)(q: (SparkSession, String) => DataFrame): Unit = {
    val rename = inMode("rename")(q(spark, sfDir))
    val manifest = inMode("manifest")(q(spark, sfDir))
    assert(manifest == rename,
      s"$name: manifest-mode result diverges from rename-mode " +
        s"(${manifest.size} vs ${rename.size} rows)")
    assert(rename.nonEmpty, s"$name: scenario produced no rows")
  }

  test("o_build_dag builds identically through the manifest protocol") {
    laneCheck("o_build_dag")(OrchestratorQueries.buildDag)
  }

  test("o_incremental_model: is_incremental + {{ this }} reads resolve " +
    "through committed manifests") {
    laneCheck("o_incremental_model")(OrchestratorQueries.incrementalModel)
  }

  test("o_insert_overwrite_pruned: partition-pruned rebuild commits and " +
    "prunes through the manifest index") {
    laneCheck("o_insert_overwrite_pruned")(OrchestratorQueries.insertOverwritePruned)
  }
}
