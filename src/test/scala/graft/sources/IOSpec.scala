package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class IOSpec extends SparkSpec {
  import spark.implicits._

  test("csv → versioned table → parquet/json roundtrip") {
    val dir = tmpDir("io-csv")
    Files.writeString(Paths.get(dir, "in.csv"), "id,name\n1,alpha\n2,beta\n")
    val df = IO.fromCsv(spark, s"$dir/in.csv")
    assert(df.count() == 2)
    val ds = IO.fromDataFrame(df, s"$dir/table")
    assert(ds.toDF.count() == 2 && ds.log.head.message == "import")
    IO.toParquet(ds.toDF, s"$dir/out.parquet", columns = Seq("name"))
    assert(spark.read.parquet(s"$dir/out.parquet").columns.toSeq == Seq("name"))
    IO.toJson(ds.toDF, s"$dir/out.json", numPartitions = 1)
    assert(IO.fromJson(spark, s"$dir/out.json").count() == 2)
  }

  test("binary media ingest: directory scan and per-row path attach") {
    val dir = tmpDir("io-bin")
    Files.write(Paths.get(dir, "a.bin"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(dir, "b.bin"), Array[Byte](9))
    val files = IO.readBinaryFiles(spark, dir, "*.bin")
    assert(files.count() == 2)
    assert(files.filter($"length" === 3).count() == 1)
    val rows = Seq((1L, s"$dir/a.bin"), (2L, s"$dir/b.bin"), (3L, s"$dir/a.bin"))
      .toDF("id", "media_path")
    val got = IO.attachBinary(rows, "media_path")
    assert(got.filter(length($"media_path_bytes") === 3).count() == 2)
  }
}
