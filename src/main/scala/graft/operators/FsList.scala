package graft.operators

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Non-located recursive file listing for metadata probes.
  *
  * `FileSystem.listFiles(path, recursive = true)` returns
  * `LocatedFileStatus` — it fetches per-file BLOCK LOCATIONS, which
  * only a locality-aware scheduler consumes. For a metadata probe
  * (maintenance stats, layout fingerprints, size planning) that weight
  * is pure overhead, and it is not small: measured on this engine's
  * local filesystem at ~5 ms/file vs ~0.05 ms/file for plain
  * `listStatus` — 100×, the difference between a maintenance probe an
  * ingest loop can run per micro-batch and a half-second stall that
  * grows with index size (SCALE.md round 12). On an object store the
  * gap is structural rather than incidental: locations are synthetic
  * there, so the located call pays extra RPC shape for information
  * that does not exist.
  */
object FsList {

  /** All plain files under `root`, recursive, non-located. */
  def files(fs: FileSystem, root: Path): Seq[FileStatus] = {
    val out = scala.collection.mutable.ArrayBuffer[FileStatus]()
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      if (s.isDirectory) walk(s.getPath) else out += s
    }
    walk(root)
    out.toSeq
  }
}
