package graft.util

/** Build-once publication of on-disk artifacts (bucketed staging tables,
  * IVF indexes, the shared MinHash band table) plus the JVM-local registry
  * of what was actually built, which Bench reports as the `staged` JSON
  * field so a rebuild landing inside a timed run is visible as one-time
  * work, not mistaken for a query regression (the r7 fingerprint-format
  * change cost a phantom 7× on q48 exactly this way). Lives in util so
  * producers (plans, operators) and the consumer (Bench) stay decoupled.
  */
object Staging {
  /** One-time state (re)built in THIS JVM — every path that pays a build
    * cost records itself here, so the `staged` field's contract holds:
    * nonempty ⇔ this process paid staging somewhere. */
  val builtThisJvm: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // serialize same-root publications inside the JVM: FileChannel.lock
  // throws OverlappingFileLockException for intra-process contention, so
  // the cross-process lock below needs a per-root monitor in front of it
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Publish the artifact directory `root` exactly once — crash-safe and
    * race-free across processes on a local filesystem:
    *  - `build` writes into a fresh hidden staging dir; a crash mid-build
    *    leaves only staging litter, never a half-valid root;
    *  - publication is a single `renameTo` under an exclusive cross-process
    *    file lock (`<root-parent>/.<root>.lock`), so two JVMs building
    *    concurrently serialize: the loser re-checks the `_BUILT` marker
    *    under the lock and reuses the winner's artifact instead of ever
    *    deleting or shadowing it;
    *  - a root without the marker (crashed pre-publication run, junk) is
    *    cleared under the same lock before rebuilding.
    * The build is recorded in [[builtThisJvm]] under `label`. Returns
    * `root`'s path. (File locks are advisory and per-filesystem — the
    * artifact directories live under the JVM temp dir or the Spark
    * warehouse, both local by construction here.) */
  def publishOnce(root: java.io.File, label: String)
      (build: java.io.File => Unit): String =
    jvmLocks.computeIfAbsent(root.getPath, _ => new Object).synchronized {
      if (!new java.io.File(root, "_BUILT").exists()) {
        root.getParentFile.mkdirs()
        val lockPath = new java.io.File(
          root.getParentFile, s".${root.getName}.lock").toPath
        val ch = java.nio.channels.FileChannel.open(lockPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lock = ch.lock()
          try {
            // re-check under the lock: another process may have published
            // while this one waited
            if (!new java.io.File(root, "_BUILT").exists()) {
              Fs.deleteRecursively(root)
              val staging = new java.io.File(root.getParentFile,
                s".${root.getName}.staging-" +
                  java.util.UUID.randomUUID().toString.take(8))
              try {
                build(staging)
                new java.io.File(staging, "_BUILT").createNewFile()
                // under the exclusive lock nothing else can occupy root —
                // a rename failure is a real environment fault, loud
                if (!staging.renameTo(root))
                  throw new IllegalStateException(
                    s"publishOnce: rename $staging -> $root failed under lock")
                builtThisJvm.add(label)
              } finally if (staging.exists()) Fs.deleteRecursively(staging)
            }
          } finally lock.release()
        } finally ch.close()
      }
      root.getPath
    }
}
