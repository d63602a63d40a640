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

  /** Root directory for durable staged artifacts (the MinHash band table,
    * IVF indexes): the `graft.staging.dir` system property, defaulting to
    * the JVM temp dir. At cluster scale staged sketch state is persisted
    * pipeline state and belongs under a real warehouse path — set the
    * property; in the sandbox the default keeps artifacts under /tmp. */
  def stagingRoot: String =
    sys.props.get("graft.staging.dir").filter(_.nonEmpty)
      .getOrElse(sys.props("java.io.tmpdir"))

  /** Cache-key fingerprint of a single-file artifact source: length +
    * mtime + CRC32 of the file's last 64 KiB — the parquet footer, where
    * the schema and every row-group's metadata live, so a regenerated
    * corpus that happens to match byte length within mtime granularity
    * still changes the digest (stale-reuse would mean silently wrong
    * results with no error). Asserts the single-file assumption loudly:
    * for a directory-style parquet `File.length()` is meaningless and the
    * caller's cache key would be garbage. */
  def fileFingerprint(f: java.io.File): String = {
    require(f.isFile, s"fileFingerprint: $f is not a regular file — " +
      "directory-style sources are not supported by the staging cache key")
    val len = f.length()
    val crc = new java.util.zip.CRC32()
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      val tail = math.min(len, 64L * 1024).toInt
      raf.seek(len - tail)
      val buf = new Array[Byte](tail)
      raf.readFully(buf)
      crc.update(buf)
    } finally raf.close()
    s"${len}_${f.lastModified()}_${java.lang.Long.toHexString(crc.getValue)}"
  }

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
