package graft.util

/** Local-mode environment shims.
  *
  * Shuffle/spill files go to tmpfs when available: in this single-node
  * sandbox all `local[N]` threads share ONE disk (~500 MB/s), which would
  * serialize the exchange I/O that a real multi-executor cluster spreads
  * over per-node disks. tmpfs is the faithful stand-in for per-executor
  * local storage when measuring N vs 4N scaling.
  */
object Env {
  lazy val localDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "spark-local")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }

  /** Benchmark scratch space for sink writes (same rationale). */
  lazy val scratchDir: String = {
    val base = new java.io.File(localDir, "graft-scratch")
    base.mkdirs()
    base.getAbsolutePath
  }
}
