package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.{Fs, Staging}

/** Unit tests for the build-once staging layer: the content fingerprint
  * that keys staged artifacts (band tables, IVF indexes) and the
  * crash-safe publishOnce protocol.
  */
class StagingSpec extends AnyFunSuite {

  private def tmpDir(prefix: String): java.io.File =
    java.nio.file.Files.createTempDirectory(prefix).toFile

  test("fileFingerprint distinguishes same-length same-mtime files by content") {
    // the exact stale-reuse hazard: a regenerated corpus matching byte
    // length and landing within mtime granularity must still change the key
    val dir = tmpDir("graft_fp")
    try {
      val f = new java.io.File(dir, "a.bin")
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](1000)(1))
      val mtime = 1700000000000L
      assert(f.setLastModified(mtime))
      val fp1 = Staging.fileFingerprint(f)
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](1000)(2))
      assert(f.setLastModified(mtime))
      val fp2 = Staging.fileFingerprint(f)
      assert(f.length() === 1000L)
      assert(fp1 !== fp2, "same length + mtime, different bytes must differ")
      // and it is stable: same bytes, same metadata => same key
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](1000)(1))
      assert(f.setLastModified(mtime))
      assert(Staging.fileFingerprint(f) === fp1)
    } finally Fs.deleteRecursively(dir)
  }

  test("fileFingerprint digests the tail (parquet footer) of large files") {
    val dir = tmpDir("graft_fp_tail")
    try {
      val f = new java.io.File(dir, "big.bin")
      val body = Array.fill[Byte](200 * 1024)(0)
      java.nio.file.Files.write(f.toPath, body)
      val mtime = 1700000000000L
      assert(f.setLastModified(mtime))
      val fp1 = Staging.fileFingerprint(f)
      // flip one byte inside the last 64 KiB window
      val raf = new java.io.RandomAccessFile(f, "rw")
      try { raf.seek(f.length() - 100); raf.write(7) } finally raf.close()
      assert(f.setLastModified(mtime))
      assert(Staging.fileFingerprint(f) !== fp1,
        "a footer byte change must change the fingerprint")
    } finally Fs.deleteRecursively(dir)
  }

  test("fileFingerprint fails loudly on a directory-style source") {
    val dir = tmpDir("graft_fp_dir")
    try {
      val e = intercept[IllegalArgumentException](Staging.fileFingerprint(dir))
      assert(e.getMessage.contains("not a regular file"))
    } finally Fs.deleteRecursively(dir)
  }

  test("pathSlug never starts with an underscore or dot (Spark ignored-metadata class)") {
    // Spark's file listing skips `_`- and `.`-prefixed paths as metadata
    // (_SUCCESS, _metadata, hidden files); a staged-artifact directory named
    // from an absolute path must never land in that class
    val slug = Staging.pathSlug("/root/testdata/sf0.1")
    assert(slug.head.isLetterOrDigit, s"slug '$slug' must start alphanumeric")
    assert(slug === "t_root_testdata_sf0_1")
    assert(Staging.pathSlug("relative/dir") === "relative_dir")
    assert(Staging.pathSlug(".hidden/x").head.isLetterOrDigit)
    // stability: the slug is a cache-key component, same input same output
    assert(Staging.pathSlug("/root/testdata/sf0.1") === slug)
  }

  test("sourceFingerprint (bucketed-table key) changes on footer content change") {
    // the same stale-reuse hazard as fileFingerprint, through the Hadoop FS
    // path that stageBucketedOnce keys on: same length + mtime, different
    // trailing bytes must change the digest — and directory sources work
    val dir = tmpDir("graft_src_fp")
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      val f = new java.io.File(dir, "part-0.parquet")
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](1000)(1))
      val mtime = 1700000000000L
      assert(f.setLastModified(mtime))
      val viaFile = Staging.sourceFingerprint(conf, f.getPath)
      val viaDir = Staging.sourceFingerprint(conf, dir.getPath)
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](1000)(2))
      assert(f.setLastModified(mtime))
      assert(f.length() === 1000L)
      assert(Staging.sourceFingerprint(conf, f.getPath) !== viaFile,
        "same length + mtime, different bytes must change the key")
      assert(Staging.sourceFingerprint(conf, dir.getPath) !== viaDir,
        "directory-style source must also see the content change")
      // absent paths key distinctly rather than erroring
      val absent = Staging.sourceFingerprint(conf, s"${dir.getPath}/nope")
      assert(absent.nonEmpty)
      assert(absent !== viaFile)
    } finally Fs.deleteRecursively(dir)
  }

  test("stagingRoot honors graft.staging.dir and defaults to the temp dir") {
    val prev = sys.props.get("graft.staging.dir")
    try {
      sys.props -= "graft.staging.dir"
      assert(Staging.stagingRoot === sys.props("java.io.tmpdir"))
      sys.props("graft.staging.dir") = "/some/warehouse/graft"
      assert(Staging.stagingRoot === "/some/warehouse/graft")
      sys.props("graft.staging.dir") = "" // empty means unset
      assert(Staging.stagingRoot === sys.props("java.io.tmpdir"))
    } finally prev match {
      case Some(v) => sys.props("graft.staging.dir") = v
      case None    => sys.props -= "graft.staging.dir"
    }
  }

  test("publishOnce builds once, reuses after, and recovers from a failed build") {
    val parent = tmpDir("graft_pub")
    try {
      val root = new java.io.File(parent, "artifact")
      var builds = 0
      // a crashing build must leave no publishable root behind
      intercept[RuntimeException] {
        Staging.publishOnce(root, "spec:crash") { staging =>
          staging.mkdirs()
          new java.io.File(staging, "partial").createNewFile()
          throw new RuntimeException("boom")
        }
      }
      assert(!root.exists(), "crashed build must not publish")
      val p1 = Staging.publishOnce(root, "spec:ok") { staging =>
        builds += 1
        staging.mkdirs()
        new java.io.File(staging, "data").createNewFile()
      }
      val p2 = Staging.publishOnce(root, "spec:ok") { staging =>
        builds += 1; staging.mkdirs()
      }
      assert(p1 === root.getPath && p2 === p1)
      assert(builds === 1, "second call must reuse, not rebuild")
      assert(new java.io.File(root, "_BUILT").exists())
      assert(new java.io.File(root, "data").exists())
      assert(Staging.builtThisJvm.contains("spec:ok"))
      assert(!Staging.builtThisJvm.contains("spec:crash"),
        "a failed build must not be recorded as built")
    } finally Fs.deleteRecursively(parent)
  }

  test("gc evicts idle and overflow staged roots, keeps fresh ones (VERDICT r11 task 7)") {
    val prev = sys.props.get("graft.staging.dir")
    val stagingDir = tmpDir("graft_gc")
    try {
      sys.props("graft.staging.dir") = stagingDir.getPath
      val fam = new java.io.File(stagingDir, "graft_bands")
      val now = 1700000000000L
      val day = 24L * 3600 * 1000
      def mkRoot(name: String, age: Long, marker: Boolean = true) = {
        val r = new java.io.File(fam, name)
        r.mkdirs()
        new java.io.File(r, "part-0.parquet").createNewFile()
        // publishOnce always creates the lock sibling before building —
        // protocol evidence gc requires before it will touch a root
        new java.io.File(fam, s".$name.lock").createNewFile()
        if (marker) {
          val m = new java.io.File(r, "_BUILT")
          m.createNewFile()
          assert(m.setLastModified(now - age))
        }
        assert(r.setLastModified(now - age))
        r
      }
      val fresh   = mkRoot("fp_fresh", 1 * day)
      val idle    = mkRoot("fp_idle", 30 * day)
      val litter  = mkRoot("fp_crash_litter", 30 * day, marker = false)
      // non-graft siblings are out of scope and must never be touched
      val foreign = new java.io.File(stagingDir, "user_data")
      foreign.mkdirs()
      // a graft_-prefixed NON-staging dir (stream staging, ckpt dirs,
      // Verify dumps share the prefix): subdirs carry no lock/_BUILT, so
      // gc must never touch them, however old or numerous
      val shared = new java.io.File(stagingDir, "graft_verify_like")
      val sharedSubs = (0 until 80).map { i =>
        val d = new java.io.File(shared, s"q$i"); d.mkdirs()
        assert(d.setLastModified(now - 40 * day)); d
      }

      val evicted = Staging.gc(maxAgeMillis = 7 * day, maxPerFamily = 64,
        now = now)
      assert(evicted.toSet === Set(idle.getPath, litter.getPath))
      assert(fresh.exists(), "a fresh root must survive max-age gc")
      assert(!idle.exists() && !litter.exists())
      assert(foreign.exists(), "gc must only sweep graft_* families")
      assert(sharedSubs.forall(_.exists()),
        "gc must never touch roots without publishOnce protocol evidence")

      // overflow: cap 2 keeps the 2 most recently used of 4
      val a = mkRoot("fp_a", 4 * day)
      val b = mkRoot("fp_b", 3 * day)
      val c = mkRoot("fp_c", 2 * day)
      val evicted2 = Staging.gc(maxAgeMillis = 365 * day, maxPerFamily = 2,
        now = now)
      assert(evicted2.toSet === Set(a.getPath, b.getPath))
      assert(fresh.exists() && c.exists())

      // publishOnce REUSE bumps last-use, so a hot artifact never expires:
      // age `fresh` to the brink, reuse it, then gc at a now past its old age
      assert(new java.io.File(fresh, "_BUILT").setLastModified(now - 6 * day))
      Staging.publishOnce(fresh, "spec:gc-touch") { _ => fail("must reuse") }
      assert(new java.io.File(fresh, "_BUILT").lastModified() > now - day,
        "reuse must bump the last-use marker")
      assert(Staging.gc(maxAgeMillis = 7 * day, maxPerFamily = 64,
        now = now).isEmpty)
      assert(fresh.exists())
    } finally {
      prev match {
        case Some(v) => sys.props("graft.staging.dir") = v
        case None    => sys.props -= "graft.staging.dir"
      }
      Fs.deleteRecursively(stagingDir)
    }
  }
}
