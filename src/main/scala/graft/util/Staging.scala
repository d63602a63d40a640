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

  /** Filesystem-safe slug of a source path for staged-artifact directory
    * names, guaranteed to start with an alphanumeric. Spark's file listing
    * treats `_`- and `.`-prefixed paths as metadata (`_SUCCESS`,
    * `_metadata`, hidden files) and SKIPS them — a slug of
    * `/root/testdata/sf0.1` must never surface as `_root_testdata_…` or a
    * glob-style read of the staged table sits on undefined behavior (today
    * a `All paths were ignored` WARN, tomorrow a silent empty read). */
  def pathSlug(path: String): String = {
    val s = path.replaceAll("[^A-Za-z0-9]+", "_")
    if (s.nonEmpty && s.head.isLetterOrDigit) s else "t" + s
  }

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

  /** Fingerprint of one or more parquet sources (single files OR
    * directory-style) via the Hadoop FS API: per contained file,
    * name + length + mtime + CRC32 of the trailing 64 KiB (the parquet
    * footer — schema and every row-group's metadata), md5-digested across
    * the listing. The footer CRC closes the stale-reuse hole a
    * metadata-only key leaves open: a regenerated source that matches byte
    * length within mtime granularity still changes the digest, so a staged
    * bucketed table can never be silently reused against new data. */
  def sourceFingerprint(conf: org.apache.hadoop.conf.Configuration,
      paths: String*): String = {
    val parts = paths.map { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      if (!fs.exists(path)) s"$p:absent"
      else {
        val st = fs.getFileStatus(path)
        val files =
          (if (st.isDirectory) fs.listStatus(path).toSeq else Seq(st))
            .filter(_.isFile).sortBy(_.getPath.getName)
        files.map { s =>
          val crc = new java.util.zip.CRC32()
          val tail = math.min(s.getLen, 64L * 1024).toInt
          val in = fs.open(s.getPath)
          try {
            in.seek(s.getLen - tail)
            val buf = new Array[Byte](tail)
            in.readFully(buf)
            crc.update(buf)
          } finally in.close()
          s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}:" +
            java.lang.Long.toHexString(crc.getValue)
        }.mkString(p + "|", ",", "")
      }
    }
    // md5 of the listing string, not a 32-bit hash: a collision across
    // testdata regenerations would silently reuse a STALE staged table
    // with no error. The input is a few hundred bytes, so the wider
    // digest is free.
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString(";").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
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
      // LRU touch: reuse (and fresh publication) bumps the marker's mtime,
      // which is what [[gc]] reads as last-use — without this, a hot
      // artifact rebuilt once and probed daily would look idle and get
      // swept at max-age.
      val marker = new java.io.File(root, "_BUILT")
      if (marker.exists()) marker.setLastModified(System.currentTimeMillis())
      root.getPath
    }

  /** Sweep staged artifact roots so a long-lived host's staging dir cannot
    * grow unbounded: content-fingerprinted band/cc/IVF/bucketed roots
    * accumulate one directory per distinct source fingerprint, and nothing
    * else ever deletes a superseded one (a regenerated corpus changes the
    * fingerprint, orphaning the old root forever).
    *
    * Policy: per family directory (`<stagingRoot>/graft_*`), evict roots
    * idle past `maxAgeMillis` (last-use = `_BUILT` mtime, bumped on every
    * [[publishOnce]] reuse) AND the oldest roots beyond `maxPerFamily`.
    * Eviction takes the same per-root cross-process lock as publication,
    * so a sweep can never tear down a root mid-publish; a root without a
    * `_BUILT` marker older than max-age is crash litter and is swept too.
    * Concurrent READERS of an evicted root are the caller's contract —
    * sweep from a maintenance window, or keep maxAge ≫ any query runtime
    * (the default, 7 days, is 5 orders of magnitude above one).
    * Returns the evicted root paths. */
  def gc(maxAgeMillis: Long = 7L * 24 * 3600 * 1000,
      maxPerFamily: Int = 64,
      now: Long = System.currentTimeMillis()): Seq[String] = {
    val families = Option(new java.io.File(stagingRoot).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("graft_"))
    def lastUse(d: java.io.File): Long = {
      val m = new java.io.File(d, "_BUILT")
      if (m.exists()) m.lastModified() else d.lastModified()
    }
    families.sortBy(_.getName).toSeq.flatMap { fam =>
      // Only roots bearing publishOnce PROTOCOL EVIDENCE are in scope: a
      // `_BUILT` marker (published) or a `.<name>.lock` sibling (the lock
      // is created before any build, so crash litter qualifies). A bare
      // `graft_*`-prefixed directory is NOT enough — stream staging dirs,
      // checkpoint dirs, and Verify dumps share the prefix under /tmp,
      // and the first sweep of this code evicted 35 subdirectories of a
      // live Verify dump via the per-family cap before this guard existed.
      val roots = Option(fam.listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(d => d.isDirectory && !d.getName.startsWith(".") &&
          (new java.io.File(d, "_BUILT").exists() ||
            new java.io.File(fam, s".${d.getName}.lock").exists()))
        .sortBy(lastUse)
      val expired = roots.filter(d => now - lastUse(d) > maxAgeMillis)
      val overflow = roots.dropRight(maxPerFamily)
      (expired ++ overflow).distinct.sortBy(_.getPath)
        .flatMap(r => evictUnderLock(r, lastUse(r), lastUse))
    }
  }

  /** Delete one staged root under its publication lock (see [[gc]]). The
    * eviction decision is RE-VALIDATED under the lock, optimistically:
    * the root is deleted only if its last-use stamp is UNCHANGED since
    * the listing that selected it. Between the unlocked listing and lock
    * acquisition another process may have rebuilt the root (publishOnce
    * holds this same lock while publishing, then stamps a fresh `_BUILT`)
    * or reused it (the reuse fast path bumps the `_BUILT` mtime) — either
    * moves the stamp, and deleting anyway would tear down an artifact
    * whose path a peer already returned to its caller. The unchanged-
    * stamp check covers both eviction policies (idle age and overflow
    * cap) with one rule: untouched since the decision ⇒ the decision
    * stands. The lock FILE itself is never deleted — unlinking a lock
    * file races a concurrent open (the opener would lock a dead inode
    * while a third process creates a fresh file), and the litter is one
    * empty file per root name. */
  private def evictUnderLock(root: java.io.File, observedLastUse: Long,
      lastUse: java.io.File => Long): Option[String] =
    jvmLocks.computeIfAbsent(root.getPath, _ => new Object).synchronized {
      val lockPath = new java.io.File(
        root.getParentFile, s".${root.getName}.lock").toPath
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          if (root.exists() && lastUse(root) == observedLastUse) {
            Fs.deleteRecursively(root)
            Some(root.getPath)
          } else None
        } finally lock.release()
      } finally ch.close()
    }
}
