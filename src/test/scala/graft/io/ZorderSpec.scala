package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout: Morton-code correctness + the measured pruning
  * contract (box queries concentrate in few files on BOTH axes). */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private def z(x: Long, y: Long, bits: Int): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Zorder.zValue(col("x"), col("y"), bits))
      .collect().head.getLong(0)

  test("Morton code interleaves bits: hand-checked values") {
    // x=0b11, y=0b01 → bits (x0,y0,x1,y1) = (1,1,1,0) → 0b0111 = 7
    assert(z(3, 1, 2) === 7L)
    assert(z(0, 0, 8) === 0L)
    // x fills even positions, y odd
    assert(z(1, 0, 4) === 1L)
    assert(z(0, 1, 4) === 2L)
    assert(z(2, 0, 4) === 4L)
    assert(z(0, 2, 4) === 8L)
    // driver recompute over a grid
    def brute(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((a, b) =>
        a | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)))
    for (x <- 0L until 8L; y <- 0L until 8L)
      assert(z(x, y, 3) === brute(x, y, 3))
  }

  test("z-ordered layout prunes on BOTH axes where a linear sort cannot") {
    // 64x64 grid of points, 16 files; box = one 16-wide stripe per axis
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, x * 64L + y)).toDF("x", "y", "payload")
    val files = 16
    val zPath = "/tmp/graft-test-zorder/z"
    val xPath = "/tmp/graft-test-zorder/linear"
    Zorder.writeZordered(grid, zPath, "x", "y", bits = 6, files)
    grid.repartitionByRange(files, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)
    def filesTouched(path: String, cond: org.apache.spark.sql.Column) =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()
    // stripe on x: both layouts prune well
    val zx = filesTouched(zPath, col("x") < 16)
    val lx = filesTouched(xPath, col("x") < 16)
    assert(zx <= files / 2 && lx <= files / 2, s"zx=$zx lx=$lx")
    // stripe on y: the x-sorted layout degrades to ALL files, the
    // z-ordered one keeps the matching rows in at most half
    val zy = filesTouched(zPath, col("y") < 16)
    val ly = filesTouched(xPath, col("y") < 16)
    assert(ly === files.toLong, s"x-sort should not cluster y (ly=$ly)")
    assert(zy <= files / 2, s"z-order must cluster y too (zy=$zy)")
    // box on both: tighter still
    val zbox = filesTouched(zPath, col("x") < 16 && col("y") < 16)
    assert(zbox <= files / 4, s"zbox=$zbox")
  }

  test("z-ordered write preserves the row set exactly") {
    val grid = (for (x <- 0 until 20; y <- 0 until 20)
      yield (x.toLong, y.toLong, s"p$x-$y")).toDF("x", "y", "payload")
    val path = "/tmp/graft-test-zorder/roundtrip"
    Zorder.writeZordered(grid, path, "x", "y", bits = 5, numFiles = 4)
    val back = spark.read.parquet(path)
    assert(back.count() === 400)
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2))).toSet ===
      grid.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2))).toSet)
  }
}
