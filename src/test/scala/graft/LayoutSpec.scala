package graft

import graft.layout.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("bucketed tables join with ZERO shuffle exchanges") {
    Layout.writeBucketed(Tables.lineitem(spark, d), "li_b", "l_orderkey", 8)
    Layout.writeBucketed(Tables.orders(spark, d), "o_b", "o_orderkey", 8)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real join plan: no AQE re-writes, no broadcast shortcut
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      assert(Layout.countExchanges(joined) == 0,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      // and an unbucketed control join DOES shuffle
      val control = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d),
          col("l_orderkey") === col("o_orderkey"))
      assert(Layout.countExchanges(control) > 0)
      assert(joined.count() == control.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("persisted IMI index reloads exactly and serves the registered j68 bit-identically") {
    import graft.operators.{ImiIndexStore, IvfKMeans}
    graft.functions.SquaredDistance.register(spark)
    val qe = Q.truncateLineage(
      IvfKMeans.quantize(Tables.embeddings(spark, d)))
    val (cl, ch) = IvfKMeans.imiHalfCodebooks(qe, 4)
    val cells = IvfKMeans.imiAssignAgainst(qe, cl, ch, 4)
      .select("vec_id", "cell")
    ImiIndexStore.save("imi_idx_t", cl, ch, cells)
    try {
      val (lcl, lch, lcells) = ImiIndexStore.load(spark, "imi_idx_t")
      // exact round trip of the cell table (integer columns — no precision
      // surface to hide behind)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(rows(lcells) == rows(cells), "cell table changed on reload")
      // serve j68's own probe panel from the LOADED artifact — answers
      // must equal the registered query row-for-row
      val probes = qe.filter(col("vec_id") % 100 === 7)
        .orderBy("vec_id").limit(64)
        .select(col("vec_id").as("probe_id"), col("qv").as("pqv"))
      val served = IvfKMeans.imiSearchTopK(lcells, qe,
          IvfKMeans.imiProbeCells(probes, lcl, lch, 4, 3), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(t => (t._1, t._4)).toSeq
      val registered = SparkEntry.queries("j68_imi_search")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(t => (t._1, t._4)).toSeq
      assert(served == registered,
        s"loaded-index serving diverges from the registered j68:\n" +
          s"  served=${served.take(5)}\n  batch =${registered.take(5)}")
      // the layout claim: cell-keyed index work reads the bucketing —
      // zero shuffle on the loaded cell table
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val occupancy = lcells.groupBy("cell").count()
        assert(Layout.countExchanges(occupancy) == 0,
          s"bucketed cell table still shuffles for a cell-keyed agg:\n" +
            s"${occupancy.queryExecution.executedPlan}")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    } finally ImiIndexStore.drop(spark, "imi_idx_t")
  }

  test("AQE splits the skewed join partition; result equals the salted rewrite") {
    // c9 proves the MANUAL salt (the form for paths AQE can't see, e.g.
    // streaming-static). This pins the claimed production path for batch:
    // AQE detects the hot key's oversized shuffle partition at runtime and
    // splits it into sub-partitions, replicating the matching build rows —
    // same trick as the salt, decided adaptively and only where skew
    // actually materialized. Thresholds are tuned down to demonstrate on
    // test-scale data (defaults target 256 MB cluster partitions).
    val hot = 0L
    // ~90% of fact rows land on one key → one shuffle partition dwarfs the
    // median and trips the skew detector
    val fact = spark.range(400000L).select(
      when(pmod(col("id"), lit(10)) < 9, lit(hot))
        .otherwise(pmod(col("id"), lit(200))).as("jk"),
      col("id").as("payload"))
    val dim = spark.range(200L).select(col("id").as("jk"),
      concat(lit("grp_"), pmod(col("id"), lit(10))).as("grp"))
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // no broadcast shortcut: skew split is a sort-merge-join rewrite
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = fact.join(dim, "jk")
        .select(col("jk"), col("payload"), col("grp"))
      val viaAqe = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire:\n$plan")
      // differential: identical multiset of rows to c9's manual salt form
      val viaSalt = Layout.saltedJoin(fact, dim, "jk",
          probeSaltExpr = pmod(col("payload"), lit(8)), nSalts = 8)
        .select(col("jk"), col("payload"), col("grp")).collect()
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      assert(canon(viaAqe).sameElements(canon(viaSalt)),
        "AQE skew-split join and salted join disagree")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // Spark's runtime row-level filtering: a selective filter on the small
    // (creation) side of a shuffle join injects a bloom-filter semi-join
    // predicate into the fact-side scan — at 100 TB this skips the bulk of
    // the fact rows before the shuffle. Size thresholds are tuned for real
    // clusters, so lower them to demonstrate on test-scale data.
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevApp = spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      val filteredOrders = Tables.orders(spark, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = Tables.lineitem(spark, d)
        .join(filteredOrders, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // semantics unchanged: compare against a control evaluated with
      // runtime bloom filtering OFF (same confs otherwise — a control under
      // identical confs would share the instrumented plan and prove nothing)
      val joinedCount = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "false")
      val control = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d)
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
      assert(!control.queryExecution.optimizedPlan.toString
        .contains("might_contain"), "control still instrumented")
      assert(joinedCount == control.count())
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        prevApp)
    }
  }

  test("cached dimension reads from InMemoryTableScan on reuse") {
    // the 100 TB caching stance: cache DIMENSIONS (bounded), never facts —
    // a hot dim serving many queries skips its scan after the first use
    val dim = Tables.customer(spark, d).cache()
    try {
      dim.count() // materialize
      val q = Tables.orders(spark, d)
        .join(dim, col("o_custkey") === col("c_custkey"))
      assert(q.queryExecution.executedPlan.toString
        .contains("InMemoryTableScan"),
        "cached dimension not served from memory")
      assert(q.count() ==
        Tables.orders(spark, d)
          .join(Tables.customer(spark, d),
            col("o_custkey") === col("c_custkey")).count())
    } finally dim.unpersist()
  }

  test("salted join returns exactly the plain join result") {
    val events = Tables.events(spark, d)
    val dim = Tables.events(spark, d)
      .select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(5)))
    val plain = events.join(dim, Seq("user_id"))
      .agg(count(lit(1)), sum("segment")).collect()(0)
    val salted = Layout.saltedJoin(events, dim, "user_id",
      pmod(hash(col("event_id")), lit(8)), nSalts = 8)
      .agg(count(lit(1)), sum("segment")).collect()(0)
    assert(plain == salted)
  }

  test("compaction collapses a fragmented table without changing its rows") {
    // simulate micro-batch fragmentation: 64 tiny files from one table
    val src = java.nio.file.Files.createTempDirectory("graft-frag").toString
    val dest = java.nio.file.Files.createTempDirectory("graft-comp").toString
    val orders = Tables.orders(spark, d)
    orders.repartition(64).write.mode("overwrite").parquet(src)
    val (before, after, bytes) =
      Layout.compact(spark, src, dest, targetBytes = bytesOf(src) / 4 + 1)
    assert(before == 64L, s"fixture wrote $before files, expected 64")
    assert(after <= 4L && after >= 1L,
      s"compaction left $after files for a 4-target rewrite")
    assert(bytes > 0L)
    // row-level identity: compaction must be a pure physical rewrite
    val a = spark.read.parquet(src).orderBy("o_orderkey", "o_custkey")
      .collect().toSeq
    val b = spark.read.parquet(dest).orderBy("o_orderkey", "o_custkey")
      .collect().toSeq
    assert(a == b, "compaction changed table contents")
  }

  test("Z-order prunes time-selective scans a user-sorted layout cannot") {
    import graft.layout.ZOrder
    // sf0.01 events: user_id × ts is the classic two-dimension case — a
    // layout sorted on user_id alone has useless per-file ts ranges.
    val ev = Tables.events(spark, TestSpark.Sf001)
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("tsu"), col("event_type"))
    val linDir = java.nio.file.Files.createTempDirectory("graft-lin").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val nFiles = 16
    ev.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linDir)
    ZOrder.zorderWrite(ev, Seq("user_id", "tsu"), zDir, nFiles = nFiles)
    // identical logical contents
    val key = Seq("user_id", "tsu", "event_type").map(col)
    assert(spark.read.parquet(zDir).orderBy(key: _*).collect().toSeq ==
      spark.read.parquet(linDir).orderBy(key: _*).collect().toSeq,
      "z-order write changed table contents")
    // a narrow TIME slice (~1/8 of the ts range, all users): the
    // user-sorted layout must open every file; the Z-order one skips most
    val Row2 = ev.agg(min("tsu"), max("tsu")).head()
    val (tsLo, tsHi) = (Row2.getLong(0), Row2.getLong(1))
    val width = (tsHi - tsLo) / 8
    val tbox = Seq(("tsu", tsLo + width, tsLo + 2 * width))
    val (linT, linN) = ZOrder.filesTouched(spark, linDir, tbox)
    val (zT, zN) = ZOrder.filesTouched(spark, zDir, tbox)
    assert(linN == nFiles.toLong && zN == nFiles.toLong)
    assert(linT == nFiles.toLong,
      s"user-sorted layout unexpectedly skipped ts files ($linT/$linN)")
    assert(zT <= nFiles / 2,
      s"z-order touched $zT/$zN files for a 1/8 ts slice")
    // a USER slice (~1/8 of users): linear wins outright (its sort key),
    // z-order must still skip SOME files — the curve's guarantee is
    // partial pruning on every dimension, not best-in-class on one
    val Row3 = ev.agg(min("user_id"), max("user_id")).head()
    val (uLo, uHi) = (Row3.getLong(0), Row3.getLong(1))
    val uw = math.max(1L, (uHi - uLo) / 8)
    val ubox = Seq(("user_id", uLo + uw, uLo + 2 * uw))
    val (linU, _) = ZOrder.filesTouched(spark, linDir, ubox)
    val (zU, _) = ZOrder.filesTouched(spark, zDir, ubox)
    assert(linU <= 4, s"user-sorted layout touched $linU files on its key")
    assert(zU < nFiles.toLong,
      s"z-order pruned nothing on user_id ($zU/$nFiles)")
    info(s"ts slice: linear $linT/$linN files, z-order $zT/$zN; " +
      s"user slice: linear $linU, z-order $zU")
  }

  test("key-clustered documents snapshot: a delta key-slice rewrites few files") {
    import graft.layout.ZOrder
    // j54's production refinement measured: the snapshot upsert only needs
    // to rewrite files that can contain delta keys, which file-level
    // min/max stats decide WITHOUT reading — but only if the layout
    // clusters by the upsert key. Same documents corpus, two layouts:
    // doc_id-range-clustered vs length-clustered (a plausible
    // "optimize for scan compression" layout whose per-file doc_id ranges
    // are useless). Delta = one re-crawled contiguous id segment (1/8 of
    // the key domain).
    val docs = Tables.documents(spark, TestSpark.Sf001)
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("len"))
    val keyDir = java.nio.file.Files.createTempDirectory("graft-key").toString
    val lenDir = java.nio.file.Files.createTempDirectory("graft-len").toString
    val nFiles = 16
    docs.repartitionByRange(nFiles, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(keyDir)
    docs.repartitionByRange(nFiles, col("len"), col("doc_id"))
      .sortWithinPartitions("len")
      .write.mode("overwrite").parquet(lenDir)
    val mm = docs.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(1L, (hi - lo) / 8)
    val box = Seq(("doc_id", lo + span, lo + 2 * span))
    val (keyT, keyN) = ZOrder.filesTouched(spark, keyDir, box)
    val (lenT, lenN) = ZOrder.filesTouched(spark, lenDir, box)
    assert(keyN == nFiles.toLong && lenN == nFiles.toLong)
    assert(keyT <= nFiles / 4,
      s"key-clustered snapshot: delta slice touches $keyT/$keyN files")
    assert(lenT == nFiles.toLong,
      s"length-clustered layout unexpectedly pruned id files ($lenT/$lenN)")
    info(s"delta id-slice rewrite: key-clustered $keyT/$keyN files, " +
      s"length-clustered $lenT/$lenN")
  }

  test("Z-order guards: >64-bit codes refused, empty input fails loudly") {
    import graft.layout.ZOrder
    import spark.implicits._
    // 5 cols x 16 bits = 80 > 64: the JVM masks shifts mod 64, so without
    // the guard this silently produced colliding Morton codes (data kept,
    // clustering garbage). Must refuse, not degrade.
    val five = (1 to 5).map(i => col(s"c$i"))
    val ranges = Seq.fill(5)((0L, 1000L))
    val e = intercept[IllegalArgumentException] {
      ZOrder.interleave(five.map(_.cast("long")), bits = 16)
    }
    assert(e.getMessage.contains("64-bit"))
    // mortonCol auto-reduces instead (16 -> 12 for 5 cols) and stays usable
    assert(ZOrder.effectiveBits(5) == 12)
    val df5 = Seq((1L, 2L, 3L, 4L, 5L), (6L, 7L, 8L, 9L, 10L))
      .toDF("c1", "c2", "c3", "c4", "c5")
    assert(df5.select(ZOrder.mortonCol(five, ranges).as("z"))
      .collect().length == 2)
    // empty input: a clear error naming the column, not an opaque NPE
    val dir = java.nio.file.Files.createTempDirectory("graft-zempty").toString
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val e2 = intercept[IllegalArgumentException] {
      ZOrder.zorderWrite(empty, Seq("a", "b"), dir)
    }
    assert(e2.getMessage.contains("'a'"), e2.getMessage)
  }

  test("Tables.spread floors parallelism on single-row-group files and " +
      "no-ops on multi-file inputs") {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    // the driver tables are one file / one row group: documents at sf0.01
    // (500 rows ≥ 64·p at the 4-thread test session) must come back
    // floored to exactly the session parallelism
    val floored = Tables.documentsSpread(spark, TestSpark.Sf001)
    assert(floored.rdd.getNumPartitions == p,
      s"expected $p partitions, got ${floored.rdd.getNumPartitions}")
    // row floor: sf0.001 supplier (10 rows < 64·p) stays the raw scan —
    // the floor must never add an exchange a tiny table can't amortize
    val tinyRaw = Tables.supplier(spark, TestSpark.Sf0001)
    val tiny = Tables.spread(spark, tinyRaw,
      s"${TestSpark.Sf0001}/supplier.parquet")
    assert(tiny eq tinyRaw,
      "row floor failed: tiny table was repartitioned")
    // unit floor: a directory with ≥ p files is already parallel — spread
    // must be the identity (no exchange), proving the 100 TB no-op claim
    val dir = java.nio.file.Files
      .createTempDirectory("graft-spread").toString + "/t.parquet"
    spark.range(0L, 64L * p * 4).toDF("id")
      .repartition(p * 2).write.parquet(dir)
    val multi = spark.read.parquet(dir)
    val spreadMulti = Tables.spread(spark, multi, dir)
    assert(spreadMulti eq multi,
      "spread repartitioned an input whose file count already covers " +
        "the session parallelism")
    // and results are identical either way (the floor is pure layout)
    assert(floored.orderBy("doc_id").collect().toSeq ==
      Tables.documents(spark, TestSpark.Sf001).orderBy("doc_id")
        .collect().toSeq)
  }

  private def bytesOf(dir: String): Long =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length).sum
}
