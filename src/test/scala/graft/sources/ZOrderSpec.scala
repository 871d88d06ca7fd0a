package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave2 places bit i of a at 2i and bit i of b at 2i+1") {
    // a=0b101, b=0b011 -> z = a0<<0 | b0<<1 | a1<<2 | b1<<3 | a2<<4 = 27
    val got = Seq((5L, 3L))
      .toDF("a", "b")
      .select(ZOrder.interleave2(col("a"), col("b"), 3).as("z"))
      .head()
      .getLong(0)
    assert(got == 27L)
    // identity checks: interleave with zero spreads bits out
    val spread = Seq((7L, 0L))
      .toDF("a", "b")
      .select(ZOrder.interleave2(col("a"), col("b"), 3).as("z"))
      .head()
      .getLong(0)
    assert(spread == 21L) // 0b10101
  }

  test("complete 16x16 grid, 16 files: every file is a 4x4 block") {
    val grid = for { a <- 0 to 15; b <- 0 to 15 } yield (a.toLong, b.toLong)
    val stats = ZOrder
      .layoutStats(grid.toDF("a", "b"), "a", "b", bits = 4,
        buckets = 16, tieCols = Seq("a", "b"))
      .collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      assert(r.getAs[Long]("n") == 16L)
      assert(r.getAs[Long]("span_a") == 4L, s"a-span in bucket $r")
      assert(r.getAs[Long]("span_b") == 4L, s"b-span in bucket $r")
    }
    // a LINEAR sort by `a` into 16 files would give span_b = 16 in every
    // file: z-order prunes selections on b 4x better, same file count
  }

  test("writeZOrdered round-trips rows and clusters the z ranges") {
    val grid = for { a <- 0 to 15; b <- 0 to 15 } yield (a.toLong, b.toLong)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(grid.toDF("a", "b"), s"$dir/t", "a", "b",
      bits = 4, files = 4)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 256L)
    assert(back.columns.toSet == Set("a", "b"), "scratch z column dropped")
  }
}
