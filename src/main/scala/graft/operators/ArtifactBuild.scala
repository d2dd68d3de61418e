package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE copy of the content-keyed staged-rename build protocol every
  * materialized artifact (ANN/IVF/IVF-PQ/BM25 indexes, LM and DSIR
  * models) runs:
  *
  *  - an artifact is COMPLETE iff its marker file (`markerRel`, the
  *    `_SUCCESS` of the LAST-written piece) exists under `path`;
  *  - a directory without the marker is a crashed prior build and is
  *    cleared;
  *  - the build writes into a process-unique staging dir, then renames
  *    into place: concurrent JVMs each stage privately, exactly one
  *    rename wins, and the loser discards its staging copy — no reader
  *    can observe a half-written artifact.
  *
  * Kept in one place so a fix to the rename-race or crash-recovery
  * logic cannot silently miss a builder.
  */
private[graft] object ArtifactBuild {

  /** Cached read of an IMMUTABLE artifact relation. Ensure-built
    * artifacts live at content-keyed paths (a regenerated corpus is a
    * NEW path), so the analyzed relation can never go stale — while
    * re-reading per query re-lists the partition tree, which for a
    * bucket/term-partitioned index (hundreds of directories) exceeds
    * the parallel-discovery threshold and schedules a listing Spark
    * JOB on every serving query. Weakly keyed by the session so test
    * sessions never alias and entries evict with their session;
    * in-process only, like Tables' cache. Mutable state dirs
    * (streaming `sets/bands/labels` batches) must NOT go through
    * this — they use StateMaintenance.readOr. */
  private val readCache = new graft.SessionCache[org.apache.spark.sql.DataFrame]

  def readCached(s: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    readCache.get(s, path)(s.read.parquet(path))

  /** One lock object per artifact path: `ensure` must serialize
    * IN-PROCESS. Without it, two concurrent ensures (parallel test
    * suites, concurrent serving queries on a cold index) can both see
    * the marker missing, and the slower one's crash-recovery `delete`
    * destroys the artifact the faster one just completed — which
    * `readCached` then pins as missing files for the session's
    * lifetime. Cross-JVM the window is NARROWED, not closed: two
    * processes can both observe the marker missing, and the slower
    * one's delete can transiently destroy the artifact the faster one
    * just renamed into place (its own rebuild re-lands it; readers in
    * that window see the pinned-listing failure). Closing it fully
    * needs a filesystem-level mutex (atomic lock-file create with
    * stale-lock recovery) — deliberate non-goal while single-process
    * builds are the deployment shape; the marker re-check sits
    * immediately before the destructive delete to keep the window at
    * its minimum. (The map never evicts: one Object per distinct
    * artifact path ever ensured in-process — bounded and byte-sized,
    * unlike the relation caches above.) */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Ensure the artifact at `path` exists and is complete; build it
    * via `build(stagingDir)` if not. Returns `path`. */
  def ensure(s: SparkSession, path: String, markerRel: String)
            (build: Path => Unit): String = {
    val hconf = s.sparkContext.hadoopConfiguration
    val destPath = new Path(path)
    val fs = destPath.getFileSystem(hconf)
    if (!fs.exists(new Path(path, markerRel)))
      buildLocks.computeIfAbsent(path, _ => new Object).synchronized {
        // re-check under the lock: a concurrent ensure may have built
        // it while this thread waited
        if (!fs.exists(new Path(path, markerRel))) {
          if (fs.exists(destPath)) fs.delete(destPath, true)
          val staging = new Path(
            path + s".tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}")
          build(staging)
          if (!fs.rename(staging, destPath)) fs.delete(staging, true)
          else {
            // The committer can legitimately skip _SUCCESS (dynamic
            // partitionOverwriteMode leaves it in the commit staging
            // dir; marksuccessfuljobs=false drops it entirely). A
            // renamed-in artifact IS complete — rename is the atomic
            // commit point — so place the marker ourselves rather than
            // let a conf choice turn every later ensure into a
            // destructive rebuild against pinned listings.
            val marker = new Path(path, markerRel)
            if (!fs.exists(marker)) fs.create(marker).close()
          }
        }
      }
    path
  }
}
