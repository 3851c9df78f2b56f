package graft

import graft.sources.Sdfs
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spec for the `sdfs_sources_sinks` surface (SURVEY §2.1): the SDFS
  * client verbs (/root/reference/inc/sdfs_client.h:20-32) mapped onto
  * Hadoop FS + Spark readers/writers.
  */
class SdfsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private lazy val sdfs = Sdfs(spark)
  private val base = java.nio.file.Files.createTempDirectory("graft_sdfs_spec").toString

  override def afterAll(): Unit = sdfs.del(base)

  private def df = {
    import spark.implicits._
    Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("id", "s", "x")
  }

  test("mkdir + exists + del") {
    val p = s"$base/d1"
    assert(!sdfs.exists(p))
    assert(sdfs.mkdir(p))
    assert(sdfs.exists(p))
    assert(sdfs.del(p))
    assert(!sdfs.exists(p))
  }

  test("put + get roundtrip preserves rows and schema (all formats)") {
    for (fmt <- sdfs.formats.filter(_ != "text")) {
      val p = s"$base/rt_$fmt"
      sdfs.put(df, p, fmt)
      val back = sdfs.get(p, fmt, Some("id BIGINT, s STRING, x DOUBLE"))
      assert(back.count() == 3, fmt)
      assert(back.schema.fieldNames.toSeq == Seq("id", "s", "x"), fmt)
      assert(back.agg(org.apache.spark.sql.functions.sum("x")).head.getDouble(0) == 7.5, fmt)
    }
  }

  test("append adds rows without rewriting existing data") {
    val p = s"$base/app"
    sdfs.put(df, p)
    val filesBefore = sdfs.ls(p).filter("name LIKE 'part-%'").count()
    sdfs.append(df, p)
    assert(sdfs.get(p).count() == 6)
    assert(sdfs.ls(p).filter("name LIKE 'part-%'").count() > filesBefore)
  }

  test("ls lists names and sizes") {
    val p = s"$base/lsdir"
    sdfs.put(df, p)
    val names = sdfs.ls(p).collect().map(_.getString(0))
    assert(names.exists(_.startsWith("part-")))
    assert(names.contains("_SUCCESS"))
  }

  test("putFile/getFile move byte-identical single files") {
    val src = java.nio.file.Files.createTempFile("graft_src", ".bin")
    val bytes = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    java.nio.file.Files.write(src, bytes)
    val dfs = s"$base/files/blob.bin"
    sdfs.putFile(src.toString, dfs)
    assert(sdfs.exists(dfs))
    val back = java.nio.file.Files.createTempDirectory("graft_back").resolve("blob.bin")
    sdfs.getFile(dfs, back.toString)
    assert(java.nio.file.Files.readAllBytes(back).toSeq == bytes.toSeq)
  }

  test("text format roundtrip") {
    import spark.implicits._
    val p = s"$base/txt"
    sdfs.put(Seq("l1", "l2").toDF("value"), p, "text")
    assert(sdfs.get(p, "text").as[String].collect().toSet == Set("l1", "l2"))
  }

  test("metadata attaches on put, reads back, and append replaces it") {
    val p = s"$base/meta_ds"
    sdfs.put(df, p, "parquet", metadata = Map("owner" -> "graft", "v" -> "1"))
    assert(sdfs.getMetadata(p).contains(Map("owner" -> "graft", "v" -> "1")))
    // the sidecar must be invisible to the Spark scan
    assert(sdfs.get(p).count() == 3)
    sdfs.append(df, p, "parquet", metadata = Map("v" -> "2"))
    assert(sdfs.getMetadata(p).contains(Map("v" -> "2")))
    // no metadata attached => None
    val bare = s"$base/meta_none"
    sdfs.put(df, bare)
    assert(sdfs.getMetadata(bare).isEmpty)
  }

  test("single-file metadata roundtrips and dies with its file") {
    val src = java.nio.file.Files.createTempFile("graft_meta", ".bin")
    java.nio.file.Files.write(src, Array[Byte](1, 2, 3))
    val dfs = s"$base/meta_files/one.bin"
    sdfs.putFile(src.toString, dfs)
    sdfs.putMetadata(dfs, Map("k" -> "value with spaces=and:colons"))
    assert(sdfs.getMetadata(dfs).contains(Map("k" -> "value with spaces=and:colons")))
    sdfs.del(dfs)
    assert(sdfs.getMetadata(dfs).isEmpty, "sidecar must not outlive its file")
  }

  test("get_num_shards counts data files, not commit markers") {
    val p = s"$base/shards"
    // enough rows that every round-robin partition is non-empty — Spark
    // writes no file for an empty partition, so a tiny frame would
    // under-count the requested sharding
    sdfs.put(spark.range(100).toDF("n").repartition(4), p)
    assert(sdfs.getNumShards(p) == 4)
    // metadata sidecar and _SUCCESS don't count as shards
    sdfs.putMetadata(p, Map("a" -> "b"))
    assert(sdfs.getNumShards(p) == 4)
    // nor do files INSIDE hidden directories (a streaming sink's
    // _spark_metadata log holds plain-named batch files)
    sdfs.mkdir(s"$p/_spark_metadata")
    val mlog = java.nio.file.Files.createTempFile("graft_mlog", "")
    java.nio.file.Files.write(mlog, "v1".getBytes)
    sdfs.putFile(mlog.toString, s"$p/_spark_metadata/0")
    assert(sdfs.getNumShards(p) == 4)
    val single = s"$base/files2/one.bin"
    val src = java.nio.file.Files.createTempFile("graft_shard", ".bin")
    java.nio.file.Files.write(src, Array[Byte](9))
    sdfs.putFile(src.toString, single)
    assert(sdfs.getNumShards(single) == 1)
  }

  test("compact merges append-accumulated small files, preserving rows and metadata") {
    import spark.implicits._
    val p = s"$base/compact_me"
    val part = spark.range(50).toDF("n")
    sdfs.put(part.repartition(4), p, "parquet", metadata = Map("v" -> "1"))
    for (_ <- 1 to 4) sdfs.append(part.repartition(4), p)
    assert(sdfs.getNumShards(p) == 20)
    val before = sdfs.get(p).as[Long].collect().sorted.toSeq
    val written = sdfs.compact(p) // 20 tiny files fit one target block
    assert(written == 1 && sdfs.getNumShards(p) == 1)
    assert(sdfs.get(p).as[Long].collect().sorted.toSeq == before)
    assert(sdfs.getMetadata(p).contains(Map("v" -> "1")), "metadata must survive the swap")
  }

  test("ls_files / ls_dirs split the listing; rmdir removes recursively") {
    val p = s"$base/split_ls"
    sdfs.mkdir(s"$p/subdir")
    sdfs.put(df, s"$p/ds")
    val src = java.nio.file.Files.createTempFile("graft_ls", ".txt")
    java.nio.file.Files.write(src, "x".getBytes)
    sdfs.putFile(src.toString, s"$p/plain.txt")
    assert(sdfs.lsFiles(p).collect().map(_.getString(0)).toSeq == Seq("plain.txt"))
    assert(sdfs.lsDirs(p).collect().map(_.getString(0)).toSeq == Seq("ds", "subdir"))
    assert(sdfs.rmdir(p))
    assert(!sdfs.exists(p))
  }

  test("bucketed tables join without a shuffle on either side") {
    import spark.implicits._
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")
    sdfs.putBucketed(li, "li_bucketed", Seq("l_orderkey"), 4)
    sdfs.putBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_bucketed", Seq("l_orderkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = sdfs.getTable("li_bucketed")
        .join(sdfs.getTable("o_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // co-location preserved correctness: same count as the plain join
      assert(joined.count() ==
        li.join(o, li("l_orderkey") === o("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("putPartitioned lays out partition dirs and a filtered read prunes to them") {
    import spark.implicits._
    val p = s"$base/parted"
    val docs = Seq(
      (1L, "train", "x"), (2L, "train", "y"), (3L, "validation", "z"),
      (4L, "test", "w"), (5L, "train", "v")).toDF("doc_id", "split", "text")
    sdfs.putPartitioned(docs, p, Seq("split"), metadata = Map("owner" -> "graft"))
    // Hive layout on disk: one directory per partition value
    val dirs = sdfs.lsDirs(p).collect().map(_.getString(0)).toSet
    assert(dirs == Set("split=train", "split=validation", "split=test"))
    assert(sdfs.getMetadata(p).contains(Map("owner" -> "graft")))
    val filtered = sdfs.get(p).filter(org.apache.spark.sql.functions.col("split") === "train")
    assert(filtered.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 5L))
    // pruning happens at PLANNING (PartitionFilters), not as a row-level
    // parquet pushdown: the scan must never open the other directories
    val scan = filtered.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in the filtered read"))
    val partFilters = scan.metadata("PartitionFilters")
    assert(partFilters.contains("split"), s"PartitionFilters missing the split predicate: $partFilters")
    assert(!scan.metadata("PushedFilters").contains("split"),
      "split must prune partitions, not be a row-level pushed filter")
    // the collect() above ran THIS plan instance: its file-count metric
    // is the number of files the scan actually opened
    val trainFiles = sdfs.lsFiles(s"$p/split=train").count()
    assert(scan.metrics("numFiles").value == trainFiles,
      s"scan opened ${scan.metrics("numFiles").value} files; split=train holds $trainFiles")
  }

  test("roundtrip query reports parity for every format") {
    val rows = Sdfs.roundtrip(spark, TestSpark.sf, rows = 200).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getBoolean(3), s"format ${r.getString(0)} lost rows"))
  }
}
