package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialize-once for shared intermediates (shingle sets, band tables,
  * inverted indexes, candidate sets): Catalyst duplicates a lazy plan's
  * whole subtree PER REFERENCE (the sf0.1 minhash plan read the corpus
  * 44× / computed signatures 20× — broadcast joins leave no exchange for
  * ReuseExchange), so every multiply-consumed expensive frame must be
  * materialized exactly once.
  *
  * Two modes via `spark.graft.materialize.mode`:
  *
  *  - `local` (default): `localCheckpoint()` — fastest locally (blocks in
  *    executor memory/disk, lineage truncated). Caveats at cluster scale:
  *    blocks are non-replicated and lineage is gone, so an executor loss
  *    or dynamic-allocation scale-down mid-query fails the job instead of
  *    recomputing.
  *  - `persist`: eager `persist(DISK_ONLY)` — spill-safe, lineage KEPT
  *    (executor loss recomputes the lost partitions), and blocks are
  *    evictable storage rather than pinned checkpoint blocks. The eager
  *    count() bounds recompute exactly like the checkpoint does (the
  *    InMemoryRelation caches every column regardless of the action).
  *
  * The default stays `local` because that is what every bench receipt was
  * measured with; `persist` is the documented cluster deployment setting.
  */
private[graft] object Materialize {
  def once(df: DataFrame): DataFrame = {
    val mode = df.sparkSession.conf
      .get("spark.graft.materialize.mode", "local")
    if (mode == "persist") {
      val p = df.persist(StorageLevel.DISK_ONLY)
      p.count()
      p
    } else df.localCheckpoint()
  }
}
