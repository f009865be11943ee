package graft

import graft.sources.Sources
import java.nio.file.Files

class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  test("csv and json roundtrip preserve data under explicit schemas") {
    val dir = Files.createTempDirectory("graft-sources").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")
    Sources.writeCsv(df, s"$dir/csv")
    Sources.writeJson(df, s"$dir/json")
    val backCsv = Sources.readCsv(spark, s"$dir/csv", df.schema)
    val backJson = Sources.readJson(spark, s"$dir/json", df.schema)
    assert(backCsv.collect().toSet == df.collect().toSet)
    assert(backJson.collect().toSet == df.collect().toSet)
    // nullability flags legitimately widen on file read; names+types hold
    assert(backCsv.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
  }

  test("orc roundtrip preserves data and schema (self-describing)") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")
    Sources.writeOrc(df, s"$dir/orc")
    val back = Sources.readOrc(spark, s"$dir/orc")
    assert(back.collect().toSet == df.collect().toSet)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    // pushdown reaches the ORC scan like parquet
    val p = back.filter($"id" > 1L).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"), p)
  }

  test("binaryFile + text sources: per-file binary rows, per-line text rows") {
    val dir = Files.createTempDirectory("graft-bin").toString
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    Files.write(java.nio.file.Paths.get(dir, "a.png"), png)
    Files.write(java.nio.file.Paths.get(dir, "b.txt"),
      "line one\nline two\n".getBytes("UTF-8"))
    // glob bounds the binary scan to the wanted extension
    val bin = Sources.readBinaryFiles(spark, dir, "*.png")
      .select("path", "length", "content").collect()
    assert(bin.length == 1)
    assert(bin.head.getAs[String]("path").endsWith("a.png"))
    assert(bin.head.getAs[Long]("length") == png.length.toLong)
    assert(bin.head.getAs[Array[Byte]]("content").sameElements(png))
    val lines = Sources.readText(spark, s"$dir/b.txt")
      .collect().map(_.getString(0)).toSet
    assert(lines == Set("line one", "line two"))
    val whole = Sources.readText(spark, s"$dir/b.txt", wholeFile = true)
      .collect().map(_.getString(0))
    assert(whole.length == 1 && whole.head.startsWith("line one\n"))
  }

  test("partitioned parquet: directory pruning at planning time") {
    val dir = Files.createTempDirectory("graft-part").toString
    val df = Catalog.table(spark, "/root/testdata/sf0.001", "events")
    Sources.writePartitioned(df, s"$dir/events", Seq("event_type"))
    val back = Sources.readParquet(spark, s"$dir/events")
    val clicks = back.filter($"event_type" === "click")
    // the partition predicate must land in PartitionFilters (pruned at
    // planning), NOT PushedFilters (evaluated against row groups)
    val scan = clicks.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan)
    assert(clicks.count() ==
      df.filter($"event_type" === "click").count())
    // only the click directory's files are planned
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles }.sum
    val planned = plannedFiles(clicks)
    val all = plannedFiles(back)
    assert(planned < all, s"planned=$planned all=$all")
  }

  test("footerRowCount: exact counts from parquet metadata, no scan") {
    val expected = Map("region" -> 5L, "nation" -> 25L, "customer" -> 150L)
    expected.foreach { case (t, n) =>
      assert(Sources.footerRowCount(spark, s"/root/testdata/sf0.001/$t.parquet") == n)
    }
  }

  test("completeness scheduling: argmin pick with deterministic ties") {
    import graft.operators.Subsetter
    assert(Subsetter.completenessScore(0, 10) == 0.0)
    assert(Subsetter.completenessScore(5, 10) == 0.5)
    assert(Subsetter.completenessScore(20, 10) == 1.0)
    assert(Subsetter.completenessScore(0, 0) == 1.0)
    val pick = Subsetter.pickNextTable(Map(
      "a" -> ((5L, 10L)), "b" -> ((1L, 10L)), "c" -> ((10L, 10L))))
    assert(pick.contains("b"))
    // tie: same score -> lexicographic
    val tie = Subsetter.pickNextTable(Map("z" -> ((1L, 2L)), "a" -> ((2L, 4L))))
    assert(tie.contains("a"))
    assert(Subsetter.pickNextTable(Map("a" -> ((3L, 3L)))).isEmpty)
  }
}
