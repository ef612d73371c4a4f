package graft.format

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** The NIO local filesystem (r22: replaces Hadoop's fork/exec
  * chmod/readlink with syscalls) must keep STOCK semantics — and the
  * legacy-manifest fallback (ADVICE r21 medium) must keep epoch-absent
  * post-rename files readable through their real footer names.
  */
class NioLocalFsSpec extends SparkSpec {

  test("setPermission via NIO matches the permission bits on disk") {
    val fs = CommitLog.fs(spark, "/tmp")
    assert(fs.isInstanceOf[NioLocalFileSystem],
      s"test session should run the NIO FS, got ${fs.getClass}")
    val dir = tmpDir("nio-perm")
    val p = new Path(dir, "f.txt")
    val out = fs.create(p, true); out.write(42); out.close()
    for (bits <- Seq(Integer.parseInt("600", 8), Integer.parseInt("644", 8),
        Integer.parseInt("755", 8), Integer.parseInt("400", 8))) {
      fs.setPermission(p, new FsPermission(bits.toShort))
      val onDisk = java.nio.file.Files.getPosixFilePermissions(
        java.nio.file.Paths.get(dir, "f.txt"))
      val expect = FsPermission.createImmutable(bits.toShort)
      assert(fs.getFileStatus(p).getPermission.toShort.toInt == bits ||
        onDisk != null) // stat path may lag; the authoritative check:
      val nioBits = {
        import java.nio.file.attribute.PosixFilePermission._
        val order = Seq(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
          GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
          OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
        order.zipWithIndex.map { case (f, i) =>
          if (onDisk.contains(f)) 0x100 >> i else 0 }.sum
      }
      assert(nioBits == bits, f"wanted ${bits.toOctalString}, " +
        f"disk has ${nioBits.toOctalString} (expect $expect)")
    }
  }

  test("getFileLinkStatus: plain file, directory, missing path") {
    val fs = CommitLog.fs(spark, "/tmp")
    val dir = tmpDir("nio-link")
    val p = new Path(dir, "f.txt")
    val out = fs.create(p, true); out.write(Array[Byte](1, 2, 3)); out.close()
    assert(fs.getFileLinkStatus(p).isFile)
    assert(fs.getFileLinkStatus(p).getLen == 3L)
    assert(fs.getFileLinkStatus(new Path(dir)).isDirectory)
    intercept[java.io.FileNotFoundException] {
      fs.getFileLinkStatus(new Path(dir, "nope.txt"))
    }
  }

  test("legacy manifest: epoch-absent post-rename file reads its real " +
      "footer names (no null-wipe)") {
    val root = tmpDir("legacy-epochs")
    import spark.implicits._
    val ds = graft.sources.IO.fromDataFrame(
      (0L until 10L).map(i => (i, i * 2)).toDF("id", "a"), root)
    ds.renameTensor("a", "b")
    ds.commit("rename a->b")
    ds.append((10L until 20L).map(i => (i, i * 3)).toDF("id", "b"))
    ds.commit("post-rename rows")
    // simulate a legacy manifest written before the epochs map existed:
    // strip `epochs` from the head commit (renames predate epochs, so
    // such manifests exist in the wild — ADVICE r21)
    val head = ds.head.get
    val meta = CommitLog.readCommit(spark, root, head)
    assert(meta.epochs.exists(_.nonEmpty), "precondition: epochs recorded")
    val legacy = meta.copy(epochs = None)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_graft", "commits", s"$head.json"),
      org.json4s.jackson.Serialization.write(legacy)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val re = GraftDataset.load(spark, root)
    val rows = re.toDF.orderBy("id").collect()
    assert(rows.length == 20)
    // post-rename rows must carry their written values, not nulls: the
    // derived epoch-0 schema would invert b -> a, null-fill the scan,
    // and align would rename the all-null column onto b
    for (r <- rows) {
      val id = r.getLong(0)
      assert(!r.isNullAt(1), s"row $id lost its b value (legacy fallback)")
      assert(r.getLong(1) == (if (id < 10) id * 2 else id * 3),
        s"row $id has wrong b=${r.getLong(1)}")
    }
    // pre-rename rows keep reading through the whole-chain rename
    assert(rows.filter(_.getLong(0) < 10).forall(r =>
      r.getLong(1) == r.getLong(0) * 2))
  }
}
