package graft.queries

import java.nio.file.Files

import graft.{Q, Tables}
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** SURVEY §2 categories A (scans), B (projection/filter), F (sort/limit),
  * G (set ops). All pure built-ins: filters and projections stay expressible
  * so Catalyst pushes them into the parquet scan (PushedFilters/ReadSchema),
  * which is the 100 TB story for this tranche — scan only what the query
  * needs.
  */
object RelationalCore {

  /** The a7 versioned table, built ONCE per (JVM, sf dir) and memoized:
    * query construction is invoked by every Verify pass, every Bench
    * sweep, and plan-only inspections — rebuilding three COW versions of
    * `documents` each time would re-pay three full write jobs and leak a
    * temp dir per call (r15 review finding). The build is deterministic,
    * so reuse cannot change results; the temp tree is removed on JVM
    * exit.
    */
  /** One memoization for both demo tables: build under a fresh temp dir
    * exactly once per (JVM, sf dir, prefix), register a recursive-delete
    * shutdown hook, return the path. The cache key carries the prefix so
    * a7 and a8 memoize independently per sf dir.
    */
  private val vlogTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def memoizedVlogTable(prefix: String, d: String)(
      build: String => Unit): String =
    vlogTables.computeIfAbsent(s"$prefix|$d", _ => {
      val dir = Files.createTempDirectory(prefix)
      sys.addShutdownHook {
        val w = java.nio.file.Files.walk(dir)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally w.close()
      }
      build(dir.toString)
      dir.toString
    })

  private def a7Table(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    memoizedVlogTable("graft-vlog-a7", d) { dir =>
      val docs = Tables.documents(s, d)
        .select("doc_id", "lang", "source", "n_chars")
      VersionedTable.append(docs.filter(col("doc_id") % 3 =!= 0), dir)
      VersionedTable.merge(s,
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("n_chars", col("n_chars") + 1000L), dir, "doc_id")
      VersionedTable.delete(s, dir, col("lang") === "de")
    }

  /** The a8 clustered table: documents range-clustered on doc_id with
    * footer-harvested file stats, built once per (JVM, sf dir).
    */
  private def a8Table(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    memoizedVlogTable("graft-vlog-a8", d) { dir =>
      VersionedTable.appendClustered(
        Tables.documents(s, d).select("doc_id", "n_chars"),
        dir, "doc_id", buckets = 8)
    }

  private def mountVlogCatalog(s: org.apache.spark.sql.SparkSession): Unit =
    s.conf.set("spark.sql.catalog.graft_vlog", "graft.sources.VlogCatalog")

  /** The a10 table: a7's v0/v1 algebra driven entirely through SQL TEXT —
    * the table starts as the doc_id%3≠0 subset (clustered, so the merge
    * has files to skip) and then ONE `MERGE INTO` upserts every
    * doc_id%5=0 row with n_chars+1000: matched keys UPDATE, missing keys
    * INSERT, exactly VersionedTable.merge's contract but through Spark's
    * SupportsRowLevelOperations route (group-based COW + runtime group
    * filtering). Built once per (JVM, sf dir).
    */
  private def a10Table(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    memoizedVlogTable("graft-vlog-a10", d) { dir =>
      val docs = Tables.documents(s, d)
        .select("doc_id", "lang", "source", "n_chars")
      VersionedTable.appendClustered(docs.filter(col("doc_id") % 3 =!= 0),
        dir, "doc_id", buckets = 8)
      mountVlogCatalog(s)
      docs.filter(col("doc_id") % 5 === 0)
        .withColumn("n_chars", col("n_chars") + 1000L)
        .createOrReplaceTempView("a10_updates")
      s.sql(s"""MERGE INTO graft_vlog.`$dir` t
                USING a10_updates u ON t.doc_id = u.doc_id
                WHEN MATCHED THEN UPDATE SET *
                WHEN NOT MATCHED THEN INSERT *""")
    }

  /** The a12 table: two plain appends — even doc_ids at v0, odd at v1 —
    * so the change range (0, 1] is exactly the odd half, with commit
    * attribution. Built once per (JVM, sf dir).
    */
  private def a12Table(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    memoizedVlogTable("graft-vlog-a12", d) { dir =>
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      VersionedTable.append(docs.filter(col("doc_id") % 2 === 0), dir)
      VersionedTable.append(docs.filter(col("doc_id") % 2 === 1), dir)
    }

  /** The a11 table: SQL `UPDATE` through the same row-level COW route —
    * German docs get n_chars += 7; the WHERE pushes as a residual filter
    * AND the runtime group filter bounds the rewrite to the files that
    * hold 'de' rows. Built once per (JVM, sf dir).
    */
  private def a11Table(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    memoizedVlogTable("graft-vlog-a11", d) { dir =>
      VersionedTable.appendClustered(
        Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
        dir, "doc_id", buckets = 8)
      mountVlogCatalog(s)
      s.sql(s"""UPDATE graft_vlog.`$dir`
                SET n_chars = n_chars + 7 WHERE lang = 'de'""")
    }

  /** The a14 table: three plain appends (each its own small-file commit,
    * the shape streaming ingest leaves), then the MAINTENANCE pass a
    * scheduler would run — `CALL graft_vlog.compact(...)` rewrites the
    * snapshot range-clustered and `CALL graft_vlog.vacuum(..., 0)`
    * reclaims the pre-compact files — all through SQL text (Spark 4's
    * `ProcedureCatalog`). Built once per (JVM, sf dir).
    */
  private def a14Table(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    memoizedVlogTable("graft-vlog-a14", d) { dir =>
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      VersionedTable.append(docs.filter(col("doc_id") % 3 === 0), dir)
      VersionedTable.append(docs.filter(col("doc_id") % 3 === 1), dir)
      VersionedTable.append(docs.filter(col("doc_id") % 3 === 2), dir)
      mountVlogCatalog(s)
      s.sql(s"CALL graft_vlog.compact('$dir', 'doc_id', 4)").collect()
      s.sql(s"CALL graft_vlog.vacuum('$dir', 0)").collect()
    }

  /** The a15 table: documents clustered on doc_id with parquet BLOOM
    * filters written for the unclustered n_chars and source columns —
    * the write-side half of point-lookup group skipping. Built once per
    * (JVM, sf dir).
    */
  private def a15Table(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    memoizedVlogTable("graft-vlog-a15", d) { dir =>
      VersionedTable.appendClustered(
        Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars"),
        dir, "doc_id", buckets = 8,
        bloomCols = Seq("n_chars", "source"))
    }

  /** The a16 table: born from a single `CREATE TABLE … AS SELECT`
    * statement — catalog DDL creates the directory-table (declared
    * schema as a zero-row v0 commit) and the CTAS write appends the
    * query result as v1. Built once per (JVM, sf dir).
    */
  private def a16Table(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    memoizedVlogTable("graft-vlog-a16", d) { dir =>
      mountVlogCatalog(s)
      Tables.documents(s, d).createOrReplaceTempView("a16_docs")
      s.sql(s"""CREATE TABLE graft_vlog.`$dir` AS
                SELECT doc_id, lang, n_chars FROM a16_docs
                WHERE doc_id % 4 <> 1""")
    }

  val queries: Seq[Q] = Seq(
    // ---- A. scans ---------------------------------------------------------
    Q("a1_scan_project",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // (l_orderkey, l_linenumber) is NOT unique in this generator's data —
        // order by ALL output columns so duplicate key tuples still yield a
        // deterministic total order (SURVEY §5.3 rule 2).
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
              ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""")),

    Q("a2_scan_events_ns",
      (s, d) => Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("event_id"),
      Some("""SELECT event_id, ts, user_id, event_type FROM events
              WHERE event_type = 'purchase' ORDER BY event_id""")),

    // SQL-text interface: the same engine surface through spark.sql over
    // registered temp views — the query text below runs verbatim in BOTH
    // Spark and DuckDB (shared dialect subset).
    Q("a3_sql_text",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        Tables.customer(s, d).createOrReplaceTempView("customer")
        s.sql("""SELECT c_mktsegment,
                        COUNT(*) AS n_orders,
                        CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                          AS BIGINT) AS total_cents
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                 GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment,
                     COUNT(*) AS n_orders,
                     CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                       AS BIGINT) AS total_cents
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Custom DataSource V2 scan (graft.sources.DocGenSource): deterministic
    // LCG row generation behind the full connector surface — doc_id range
    // predicates PUSH into the source (the generated interval itself
    // narrows: 10k configured rows, 5k ever produced), lang stays residual,
    // column pruning drops source/quality_ppm from generation, and
    // post-pushdown statistics feed the optimizer. The DuckDB oracle
    // re-derives every value from generate_series + the same LCG, so
    // pushdown narrowing and residual evaluation are hash-checked, not
    // just plan-asserted (PlanSpec pins the plan side).
    Q("a4_dsv2_pushdown",
      (s, _) => s.read.format("graft-docgen")
        .option("rows", "10000").option("partitions", "8").load()
        .filter(col("doc_id") >= 2500 && col("doc_id") < 7500)
        .filter(col("lang") === "en")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id"),
      Some("""WITH g AS (
                SELECT i AS doc_id,
                       (1103515245 * i + 12345) % 2147483648 AS x
                FROM generate_series(2500, 7499) s(i)),
              t AS (
                SELECT doc_id,
                       (['en','es','de','fr','zh'])[CAST(x % 5 AS INT) + 1]
                         AS lang,
                       CAST(48 + (x // 20) % 500 AS BIGINT) AS n_chars
                FROM g)
              SELECT doc_id, lang, n_chars FROM t
              WHERE lang = 'en' ORDER BY doc_id""")),

    // The catalog half of the DSv2 surface: the SAME generated table
    // reached through plain SQL text via a TableCatalog plugin
    // (spark.sql.catalog.graft -> DocGenCatalog) — identifier
    // graft.docgen_10000_8, pushdown and pruning identical to a4's
    // DataFrame path because both resolve to the same ScanBuilder. The
    // conf set is idempotent and makes the query self-sufficient on a
    // foreign session (catalog configs resolve lazily at first lookup).
    Q("a5_catalog_sql",
      (s, _) => {
        s.conf.set("spark.sql.catalog.graft", "graft.sources.DocGenCatalog")
        s.sql("""SELECT source, COUNT(*) AS n_docs,
                        CAST(SUM(n_chars) AS BIGINT) AS chars_total
                 FROM graft.docgen_10000_8
                 WHERE doc_id >= 2500 AND doc_id < 7500
                 GROUP BY source ORDER BY source""")
      },
      Some("""WITH g AS (
                SELECT i AS doc_id,
                       (1103515245 * i + 12345) % 2147483648 AS x
                FROM generate_series(2500, 7499) s(i)),
              t AS (
                SELECT doc_id,
                       (['web','books','code','wiki'])
                         [CAST((x // 5) % 4 AS INT) + 1] AS source,
                       48 + (x // 20) % 500 AS n_chars
                FROM g)
              SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS chars_total
              FROM t GROUP BY source ORDER BY source""")),

    // The third DSv2 pushdown surface (round 14): AGGREGATE pushdown.
    // count/min/max/sum over the generator's row index have closed forms on
    // the (filter-narrowed) interval, so the source answers this query from
    // arithmetic — zero rows generated, zero rows aggregated, O(1) in the
    // configured row count (here 100M rows, which a generate-then-aggregate
    // plan would take seconds over and the pushed plan answers instantly;
    // PlanSpec pins the executed plan carries NO HashAggregate and the scan
    // advertises the pushed functions). supportCompletePushDown means Spark
    // drops its own Aggregate node entirely; the oracle recomputes all four
    // closed forms from a real generate_series aggregation, so the
    // arithmetic (incl. the Gauss sum and the filter∘aggregate composition
    // order) is hash-checked, not trusted.
    Q("a6_agg_pushdown",
      (s, _) => s.read.format("graft-docgen")
        .option("rows", "100000000").option("partitions", "8").load()
        .where(col("doc_id") >= 12345 && col("doc_id") < 90000000)
        .agg(count(col("doc_id")).as("n_rows"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(col("doc_id")).as("sum_id")),
      Some("""SELECT count(*) AS n_rows,
                     CAST(min(i) AS BIGINT) AS min_id,
                     CAST(max(i) AS BIGINT) AS max_id,
                     CAST(sum(i) AS BIGINT) AS sum_id
              FROM generate_series(12345, 89999999) s(i)""")),

    // Snapshot-versioned table with time travel (graft.sources
    // .VersionedTable — the MVCC commit-log format): the query BUILDS a
    // versioned table from `documents` (v0 = append of the doc_id%3≠0
    // subset, v1 = copy-on-write MERGE upserting every doc_id%5=0 row
    // with n_chars+1000 — replacing matched keys, inserting the rest —
    // v2 = copy-on-write DELETE of lang='de'), then TIME-TRAVEL-reads all
    // three snapshots and emits one integer-exact summary row per
    // version. The oracle recomputes each snapshot's contents from the
    // same relational algebra over raw `documents` — so the hash match
    // proves the log replay, the merge/delete file algebra, and the
    // historical reads reconstruct exactly the right row sets. Scale:
    // the log is metadata-sized and checkpoint-bounded; reads prune to
    // the snapshot's file list; see VersionedTable's scaladoc for the
    // partition-scoped COW note. Sums are BIGINT-cast on the oracle side
    // (DuckDB sum→HUGEINT would fail the type gate).
    Q("a7_time_travel",
      (s, d) => {
        val dir = a7Table(s, d)
        (0L to 2L).map { v =>
          VersionedTable.read(s, dir, Some(v))
            .agg(count(lit(1)).as("n_docs"),
              sum("n_chars").as("sum_chars"),
              sum("doc_id").as("id_sum"))
            .select(lit(v).as("version"), col("n_docs"),
              col("sum_chars"), col("id_sum"))
        }.reduce(_ unionByName _).orderBy("version")
      },
      Some("""WITH v0 AS (
                SELECT doc_id, lang, n_chars FROM documents
                WHERE doc_id % 3 <> 0),
              v1 AS (
                SELECT doc_id, lang, n_chars FROM v0 WHERE doc_id % 5 <> 0
                UNION ALL
                SELECT doc_id, lang, n_chars + 1000 FROM documents
                WHERE doc_id % 5 = 0),
              v2 AS (SELECT * FROM v1 WHERE lang <> 'de'),
              s0 AS (SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_docs,
                            CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                            CAST(sum(doc_id) AS BIGINT) AS id_sum FROM v0),
              s1 AS (SELECT CAST(1 AS BIGINT), count(*),
                            CAST(sum(n_chars) AS BIGINT),
                            CAST(sum(doc_id) AS BIGINT) FROM v1),
              s2 AS (SELECT CAST(2 AS BIGINT), count(*),
                            CAST(sum(n_chars) AS BIGINT),
                            CAST(sum(doc_id) AS BIGINT) FROM v2)
              SELECT * FROM s0 UNION ALL SELECT * FROM s1
              UNION ALL SELECT * FROM s2 ORDER BY version""")),

    // Data skipping under the oracle gate: documents written ONCE as a
    // range-clustered versioned table with per-file min/max footer stats
    // (VersionedTable.appendClustered), then a key-range query answered
    // through readPruned — which scans ONLY the files whose stats
    // interval overlaps [100, 299] (≤2 of 8 at every SF; the spec pins
    // the file counts, this row pins that the PRUNED answer is the
    // exact answer: DuckDB computes the same range over raw documents).
    // The 100 TB point: the predicate never touches most of the table's
    // bytes, and the decision comes from metadata the writer already
    // paid for.
    Q("a8_data_skipping",
      (s, d) => {
        val dir = a8Table(s, d)
        VersionedTable.readPruned(s, dir, "doc_id", 100L, 299L)
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            sum("doc_id").as("id_sum"))
          .select(col("n_docs"), col("sum_chars"), col("id_sum"))
      },
      Some("""SELECT count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                     CAST(sum(doc_id) AS BIGINT) AS id_sum
              FROM documents WHERE doc_id BETWEEN 100 AND 299""")),

    // The SQL/catalog surface for the versioned table (round 16 —
    // graft.sources.VlogCatalog + VlogSource): the SAME a7 table, reached
    // as plain SQL TEXT with time travel — the identifier IS the table
    // directory (backtick-quoted) and `VERSION AS OF 1` routes through
    // the public DSv2 loadTable(ident, version) hook to the mid-history
    // MERGE snapshot. The scan is the engine's own DSv2 reader over the
    // commit log (column pruning reaches the per-file parquet projection;
    // here only lang + n_chars are ever decoded), so the oracle's
    // relational recomputation of v1 hash-checks log replay + snapshot
    // resolution + the custom reader's decode in one row set. The conf
    // set is idempotent (same catalog LocalSession mounts).
    Q("a9_sql_time_travel",
      (s, d) => {
        val dir = a7Table(s, d)
        s.conf.set("spark.sql.catalog.graft_vlog",
          "graft.sources.VlogCatalog")
        s.sql(s"""SELECT lang, COUNT(*) AS n_docs,
                         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
                  FROM graft_vlog.`$dir` VERSION AS OF 1
                  GROUP BY lang ORDER BY lang""")
      },
      Some("""WITH v0 AS (
                SELECT doc_id, lang, n_chars FROM documents
                WHERE doc_id % 3 <> 0),
              v1 AS (
                SELECT doc_id, lang, n_chars FROM v0 WHERE doc_id % 5 <> 0
                UNION ALL
                SELECT doc_id, lang, n_chars + 1000 FROM documents
                WHERE doc_id % 5 = 0)
              SELECT lang, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS sum_chars
              FROM v1 GROUP BY lang ORDER BY lang""")),

    // SQL MERGE INTO (round 17 — the r16 verdict's task #3): the same
    // upsert algebra as a7's v1, driven as plain MERGE TEXT through
    // Spark's SupportsRowLevelOperations — group-based copy-on-write over
    // the commit log, with runtime group filtering (the `_file` metadata
    // column) bounding the rewrite to files that actually hold matched
    // keys (VersionedTableSpec pins the ≤2-of-8 touched-file bound
    // through this exact SQL path). The oracle recomputes the post-merge
    // snapshot relationally from raw documents, so the hash proves the
    // MERGE rewrite (matched UPDATE + unmatched INSERT + untouched
    // passthrough), the COW file swap, and the snapshot read end-to-end.
    // The summary splits per lang AND per upserted-vs-untouched row class
    // so a lost/duplicated insert or a misapplied update cannot cancel out.
    Q("a10_sql_merge",
      (s, d) => {
        val dir = a10Table(s, d)
        mountVlogCatalog(s)
        s.sql(s"""SELECT lang,
                         CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_upserted,
                         COUNT(*) AS n_docs,
                         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                         CAST(SUM(doc_id) AS BIGINT) AS id_sum
                  FROM graft_vlog.`$dir`
                  GROUP BY lang ORDER BY lang""")
      },
      Some("""WITH v0 AS (
                SELECT doc_id, lang, n_chars FROM documents
                WHERE doc_id % 3 <> 0),
              v1 AS (
                SELECT doc_id, lang, n_chars FROM v0 WHERE doc_id % 5 <> 0
                UNION ALL
                SELECT doc_id, lang, n_chars + 1000 FROM documents
                WHERE doc_id % 5 = 0)
              SELECT lang,
                     CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_upserted,
                     COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                     CAST(SUM(doc_id) AS BIGINT) AS id_sum
              FROM v1 GROUP BY lang ORDER BY lang""")),

    // SQL UPDATE through the same row-level route (RewriteUpdateTable →
    // group-based ReplaceData): German docs get n_chars += 7 — the
    // oracle recomputes the conditional bump relationally; the per-lang
    // split makes a misrouted update (wrong rows bumped) unmissable.
    Q("a11_sql_update",
      (s, d) => {
        val dir = a11Table(s, d)
        mountVlogCatalog(s)
        s.sql(s"""SELECT lang, COUNT(*) AS n_docs,
                         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
                  FROM graft_vlog.`$dir`
                  GROUP BY lang ORDER BY lang""")
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars +
                       CASE WHEN lang = 'de' THEN 7 ELSE 0 END) AS BIGINT)
                       AS sum_chars
              FROM documents GROUP BY lang ORDER BY lang""")),

    // The change feed through SQL under the oracle gate (round 17, task
    // #6): even doc_ids land at v0, odd at v1, and the query reads ONLY
    // the range (0, 1] through `@changes(0,1)` — IO ∝ commit 1's files,
    // never a snapshot scan — with the Delta-CDF metadata columns folded
    // into the output (min/max(_commit_version) pin the attribution to
    // exactly version 1; a snapshot leak would drag version 0 rows in
    // and break n_docs AND the version bounds at once). The oracle
    // recomputes the odd half relationally.
    Q("a12_sql_changes",
      (s, d) => {
        val dir = a12Table(s, d)
        mountVlogCatalog(s)
        s.sql(s"""SELECT lang, COUNT(*) AS n_docs,
                         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                         CAST(MIN(_commit_version) AS BIGINT) AS v_lo,
                         CAST(MAX(_commit_version) AS BIGINT) AS v_hi
                  FROM graft_vlog.`$dir@changes(0,1)`
                  GROUP BY lang ORDER BY lang""")
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                     CAST(1 AS BIGINT) AS v_lo, CAST(1 AS BIGINT) AS v_hi
              FROM documents WHERE doc_id % 2 = 1
              GROUP BY lang ORDER BY lang""")),

    // Aggregate pushdown over the vlog table (round 17): every value in
    // this row is answered from parquet FOOTERS — block row counts, null
    // counts and exact int64 min/max statistics — through per-bundle
    // PARTIAL rows folded by Spark's final aggregate, zero data pages
    // read (PlanSpec pins `PushedAggregates` in the scan and the spec
    // pins the partial-row reader against a decode of the same files).
    // At 100 TB this is the difference between a full-table scan and a
    // footer walk fanned across executors.
    Q("a13_vlog_agg_push",
      (s, d) => {
        val dir = a8Table(s, d)
        mountVlogCatalog(s)
        s.sql(s"""SELECT COUNT(*) AS n_rows, COUNT(n_chars) AS n_vals,
                         MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
                         MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
                  FROM graft_vlog.`$dir`""")
      },
      Some("""SELECT COUNT(*) AS n_rows, COUNT(n_chars) AS n_vals,
                     MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
                     MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
              FROM documents""")),

    // SQL-driven table maintenance (round 17): the a14 builder ingests
    // three small-file commits, then runs `CALL graft_vlog.compact` and
    // `CALL graft_vlog.vacuum` — the scheduler surface — before this
    // query reads the result. The oracle proves the maintenance cycle
    // preserved contents exactly, and the @history count proves the
    // compact COMMITTED (4 = three appends + one compact; vacuum adds no
    // version) and vacuum left the log intact.
    Q("a14_sql_maintenance",
      (s, d) => {
        val dir = a14Table(s, d)
        // per-session, not per-JVM: the memoized builder mounted the
        // catalog on ITS session; this one may be a different session
        mountVlogCatalog(s)
        s.sql(s"""SELECT lang, COUNT(*) AS n_docs,
                         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                         v.n_versions
                  FROM graft_vlog.`$dir`
                  CROSS JOIN (SELECT COUNT(*) AS n_versions
                              FROM graft_vlog.`$dir@history`) v
                  GROUP BY lang, v.n_versions ORDER BY lang""")
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                     CAST(4 AS BIGINT) AS n_versions
              FROM documents GROUP BY lang ORDER BY lang""")),

    // Point lookups through the vlog scan (round 17): `IN` and string
    // `=` conjuncts push as group-skip hints — the doc_id IN set prunes
    // FILES through log stats (its envelope) and ROW GROUPS through
    // parquet stats, while the source probe engages the written bloom /
    // dictionary filtering (the a15 table writes parquet blooms for its
    // unclustered columns). All filters stay residual, so the oracle
    // proves the skip machinery is pure optimization — the 100-TB
    // needle-in-haystack query shape (spec pins the skipping itself).
    Q("a15_point_lookup",
      (s, d) => {
        val dir = a15Table(s, d)
        mountVlogCatalog(s)
        s.sql(s"""SELECT doc_id, lang, source, n_chars
                  FROM graft_vlog.`$dir`
                  WHERE source IN ('src3', 'src7')
                    AND doc_id IN (2,3,5,8,13,21,34,55,89,144,233,377)
                  ORDER BY doc_id""")
      },
      Some("""SELECT doc_id, lang, source, n_chars FROM documents
              WHERE source IN ('src3', 'src7')
                AND doc_id IN (2,3,5,8,13,21,34,55,89,144,233,377)
              ORDER BY doc_id""")),

    // Catalog DDL (round 17): the table this query reads was born from
    // one `CREATE TABLE graft_vlog.`…` AS SELECT` statement — DDL
    // creates the directory-table with its declared schema recorded as
    // a zero-row v0 commit (the schema-from-footers invariant holds for
    // empty tables with no side-channel schema file) and the CTAS write
    // appends the filtered projection as v1. The oracle recomputes the
    // CTAS predicate relationally, proving the whole
    // create→write→read-back cycle; the spec additionally pins empty-
    // table reads, INSERT INTO, double-CREATE refusal, the
    // PARTITIONED BY refusal, and DROP TABLE.
    Q("a16_sql_ctas",
      (s, d) => {
        val dir = a16Table(s, d)
        // per-session, not per-JVM: the memoized builder mounted the
        // catalog on ITS session; this one may be a different session
        mountVlogCatalog(s)
        s.sql(s"""SELECT lang, COUNT(*) AS n_docs,
                         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
                  FROM graft_vlog.`$dir`
                  GROUP BY lang ORDER BY lang""")
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS sum_chars
              FROM documents WHERE doc_id % 4 <> 1
              GROUP BY lang ORDER BY lang""")),

    // ---- B. projection / filter / predicates ------------------------------
    Q("b1_filter_pred",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp") &&
          (col("l_discount").between(0.02, 0.08) || col("l_quantity") < 10) &&
          col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
          "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
          "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
                     l_discount
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02'
                AND (l_discount BETWEEN 0.02 AND 0.08 OR l_quantity < 10)
                AND l_returnflag IN ('A','R')
              ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity,
                       l_discount""")),

    Q("b2_project_expr",
      (s, d) => Tables.lineitemSpread(s, d)
        .withColumn("revenue_cents",
          Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .withColumn("price_band",
          when(col("l_extendedprice") < 20000.0, "low")
            .when(col("l_extendedprice") < 50000.0, "mid")
            .otherwise("high"))
        // round-before-cast: Spark's double→long cast truncates, DuckDB's
        // rounds (Q.cents rationale) — integral today, keep it data-proof
        .withColumn("qty_int", round(col("l_quantity")).cast("long"))
        .select("l_orderkey", "l_linenumber", "revenue_cents", "price_band",
          "qty_int")
        .orderBy("l_orderkey", "l_linenumber", "revenue_cents", "price_band",
          "qty_int"),
      Some("""SELECT l_orderkey, l_linenumber,
                     CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)
                       AS revenue_cents,
                     CASE WHEN l_extendedprice < 20000 THEN 'low'
                          WHEN l_extendedprice < 50000 THEN 'mid'
                          ELSE 'high' END AS price_band,
                     CAST(round(l_quantity) AS BIGINT) AS qty_int
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, revenue_cents, price_band,
                       qty_int""")),

    Q("b3_null_handling",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left")
        .select(col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("order_key"),
          col("o_orderkey").isNotNull.as("has_order"),
          coalesce(col("o_totalprice"), lit(0.0)).as("price_or_zero"))
        .orderBy("c_custkey", "order_key"),
      Some("""SELECT c_custkey, COALESCE(o_orderkey, -1) AS order_key,
                     o_orderkey IS NOT NULL AS has_order,
                     COALESCE(o_totalprice, 0.0) AS price_or_zero
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              ORDER BY c_custkey, order_key""")),

    // Correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + join (RewriteCorrelatedScalarSubquery), so the physical
    // plan is one shuffle on o_custkey, not a per-row re-scan: the property
    // that makes the shape survive 100 TB. Same text runs in both engines.
    Q("b4_scalar_subquery",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        // knife-edge discipline (SURVEY §5.3): compare integer cents against
        // the ROUNDED threshold so an ulp of cross-engine avg() summation
        // divergence can't flip row membership at the boundary
        s.sql("""SELECT o.o_orderkey, o.o_custkey,
                        CAST(round(o.o_totalprice*100) AS BIGINT) AS cents
                 FROM orders o
                 WHERE CAST(round(o.o_totalprice*100) AS BIGINT) >
                   (SELECT CAST(round(1.5 * avg(o2.o_totalprice) * 100)
                      AS BIGINT) FROM orders o2
                    WHERE o2.o_custkey = o.o_custkey)
                 ORDER BY o_orderkey""")
      },
      Some("""SELECT o.o_orderkey, o.o_custkey,
                     CAST(round(o.o_totalprice*100) AS BIGINT) AS cents
              FROM orders o
              WHERE CAST(round(o.o_totalprice*100) AS BIGINT) >
                (SELECT CAST(round(1.5 * avg(o2.o_totalprice) * 100)
                   AS BIGINT) FROM orders o2
                 WHERE o2.o_custkey = o.o_custkey)
              ORDER BY o_orderkey""")),

    // IN + correlated NOT EXISTS subqueries — decorrelated to left-semi and
    // left-anti joins (the c4 shapes) by both engines' planners.
    Q("b5_in_exists_subquery",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        Tables.customer(s, d).createOrReplaceTempView("customer")
        s.sql("""SELECT c_custkey, c_name FROM customer
                 WHERE c_custkey IN (SELECT o_custkey FROM orders
                                     WHERE o_orderpriority = '1-URGENT')
                   AND NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_custkey = c_custkey
                                     AND o.o_orderpriority = '5-LOW')
                 ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE c_custkey IN (SELECT o_custkey FROM orders
                                  WHERE o_orderpriority = '1-URGENT')
                AND NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c_custkey
                                  AND o.o_orderpriority = '5-LOW')
              ORDER BY c_custkey""")),

    // Recursive CTE (round 14) — Spark 4's WITH RECURSIVE (UnionLoop):
    // iterative transitive closure, the query shape graph traversals and
    // BOM explosions need and the one the engine previously expressed only
    // through driver-looped joins (ConnectedComponents). Hierarchy derived
    // in SQL on both engines: parent(ck) = ck div 10 — a 10-ary referral
    // tree over customer, roots ck < 10, provably terminating (parent < ck)
    // at depth ≤ 4 here. Each recursion step is ONE keyed equi-join of the
    // frontier against customer — at 100 TB that's depth × shuffle(join
    // key), never a materialized closure. Per-depth rollup keeps the
    // output scalar and deterministic. The only dialect split is integer
    // division (Spark DIV, DuckDB //); the recursion structure is
    // identical text.
    Q("b6_recursive_cte",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer")
        s.sql("""WITH RECURSIVE chain(custkey, root, depth) AS (
                   SELECT c_custkey, c_custkey, 0 FROM customer
                   WHERE c_custkey < 10
                   UNION ALL
                   SELECT c.c_custkey, ch.root, ch.depth + 1
                   FROM customer c JOIN chain ch
                     ON c.c_custkey DIV 10 = ch.custkey
                   WHERE c.c_custkey >= 10
                 )
                 SELECT depth, COUNT(*) AS n_members,
                        COUNT(DISTINCT root) AS n_roots,
                        CAST(SUM(custkey) AS BIGINT) AS key_sum
                 FROM chain GROUP BY depth ORDER BY depth""")
      },
      Some("""WITH RECURSIVE chain(custkey, root, depth) AS (
                SELECT c_custkey, c_custkey, 0 FROM customer
                WHERE c_custkey < 10
                UNION ALL
                SELECT c.c_custkey, ch.root, ch.depth + 1
                FROM customer c JOIN chain ch
                  ON c.c_custkey // 10 = ch.custkey
                WHERE c.c_custkey >= 10
              )
              SELECT depth, COUNT(*) AS n_members,
                     COUNT(DISTINCT root) AS n_roots,
                     CAST(SUM(custkey) AS BIGINT) AS key_sum
              FROM chain GROUP BY depth ORDER BY depth""")),

    // ---- F. sort / limit --------------------------------------------------
    // TakeOrderedAndProjectExec: per-partition top-K then merge on the
    // driver — no global sort materialization, which is exactly the plan
    // wanted at 100 TB for a bounded LIMIT.
    Q("f1_order_limit",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // Keyset-free pagination: ORDER BY … LIMIT k OFFSET n. Spark's offset()
    // still plans the bounded-sort path (top n+k per partition, then drop n
    // at the driver-side merge) — fine for page-sized offsets; deep
    // pagination at scale should switch to a keyset predicate (WHERE key >
    // last-seen ORDER BY key LIMIT k), which is the f1 shape plus a filter.
    Q("f4_limit_offset",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(100)
        .limit(50)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 50 OFFSET 100""")),

    // Keyset pagination — f4's documented scale fix made a registered
    // query: resume AFTER a (o_totalprice, o_orderkey) anchor with a
    // row-valued comparison predicate instead of OFFSET. The page fetch
    // is then f1's TakeOrderedAndProject shape at limit k (top-50 heap
    // per partition), NOT offset's top-(n+k) — the difference between a
    // bounded heap and "haul the first n pages to the driver on every
    // request", which is what makes deep pagination survivable at 100 TB
    // (PlanSpec pins the limit-50 vs limit-150 plans). The anchor here is
    // computed inline (last key of f4's page, a 1-row broadcast) so the
    // query is self-contained at any SF; a paging API would pass the
    // client's last-seen key as the literal.
    Q("f5_keyset_page",
      (s, d) => {
        val anchor = Tables.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .offset(149).limit(1)
          .select(col("o_totalprice").as("ap"), col("o_orderkey").as("ak"))
        Tables.orders(s, d)
          .crossJoin(broadcast(anchor))
          .filter(col("o_totalprice") < col("ap") ||
            (col("o_totalprice") === col("ap") &&
              col("o_orderkey") > col("ak")))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(50)
          .select("o_orderkey", "o_custkey", "o_totalprice")
      },
      Some("""WITH a AS (
                SELECT o_totalprice AS ap, o_orderkey AS ak FROM orders
                ORDER BY o_totalprice DESC, o_orderkey
                LIMIT 1 OFFSET 149)
              SELECT o_orderkey, o_custkey, o_totalprice FROM orders, a
              WHERE o_totalprice < ap
                 OR (o_totalprice = ap AND o_orderkey > ak)
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""")),

    // Seeded Bernoulli sample — deterministic within Spark (fixed seed) but
    // RNG-incompatible with DuckDB, so no SQL oracle; the driver's
    // rows-only check still pins the row count. Reads RAW (no parallelism
    // floor): the per-partition RNG makes the sampled set a function of the
    // input partitioning, so Tables.spread under it would change the rows.
    Q("f2_sample",
      (s, d) => Tables.raw(s, d, "orders")
        .sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey"),
      None),

    // Stratified (per-class) sampling — the class-balancing primitive of a
    // training-data pipeline: downsample over-represented languages, keep
    // rare ones whole. Seeded Bernoulli per stratum (sampleBy), so
    // deterministic within Spark but RNG-incompatible with the oracle
    // engine → rows-only check, like f2; the per-stratum proportions are
    // law-tested in QueriesSpec. Raw read — same partition-sensitivity
    // note as f2.
    Q("f3_stratified_sample",
      (s, d) => Tables.raw(s, d, "documents")
        .stat.sampleBy("lang",
          Map("en" -> 0.5, "de" -> 0.5, "fr" -> 1.0, "es" -> 1.0,
            "zh" -> 1.0),
          seed = 42L)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      None),

    // Deterministic hash sample — f2's ORACLED twin, and the sampler a
    // REPRODUCIBLE pipeline actually wants at 100 TB: membership is a pure
    // function of the key (j36's exact-BIGINT LCG, mod 100 < 5 ≈ 5%), no
    // RNG state, so the same rows are sampled on every engine, every rerun,
    // every partitioning — which is also what makes it the first sampler in
    // the f-family the DuckDB oracle can replay row-for-row (f2/f3's seeded
    // Bernoulli is Spark-RNG-specific, sanctioned rows-only). Map-side
    // filter, zero exchanges before the output sort; at 100 TB it composes
    // with any downstream op as a free scan predicate.
    Q("f6_hash_sample",
      (s, d) => Tables.orders(s, d)
        .where(expr(
          "((o_orderkey % 1000003) * 2654435761 + 101) % 2147483648 % 100 < 5"))
        .select(col("o_orderkey"), col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
              WHERE ((o_orderkey % 1000003) * 2654435761 + 101)
                    % 2147483648 % 100 < 5
              ORDER BY o_orderkey""")),

    // Deterministic stratified hash sample — f3's ORACLED twin: per-stratum
    // rates (downsample the over-represented languages to 10%/20%, keep the
    // rare ones whole — the class-balancing primitive) applied through the
    // same keyed LCG, so stratum membership AND the sampled set are exact
    // cross-engine facts. The rate table is a literal CASE (at production
    // scale: a broadcast dimension); the filter stays map-side either way.
    Q("f7_hash_stratified",
      (s, d) => Tables.documents(s, d)
        .where(expr(
          """((doc_id % 1000003) * 2654435761 + 101) % 2147483648 % 100 <
             CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 20
                       ELSE 100 END"""))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, source FROM documents
              WHERE ((doc_id % 1000003) * 2654435761 + 101)
                    % 2147483648 % 100 <
                    CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 20
                              ELSE 100 END
              ORDER BY doc_id""")),

    // ---- G. set operations -------------------------------------------------
    Q("g1_union",
      (s, d) => Tables.orders(s, d).select(col("o_custkey").as("k"))
        .union(Tables.events(s, d).select(col("user_id").as("k")))
        .distinct()
        .orderBy("k"),
      Some("""SELECT DISTINCT k FROM (
                SELECT o_custkey AS k FROM orders
                UNION ALL SELECT user_id AS k FROM events)
              ORDER BY k""")),

    Q("g2_intersect",
      (s, d) => Tables.orders(s, d).select(col("o_custkey").as("k"))
        .intersect(Tables.customer(s, d)
          .filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("k")))
        .orderBy("k"),
      Some("""SELECT o_custkey AS k FROM orders
              INTERSECT
              SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
              ORDER BY k""")),

    Q("g3_except",
      (s, d) => Tables.customer(s, d).select(col("c_custkey").as("k"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_custkey AS k FROM customer
              EXCEPT
              SELECT o_custkey AS k FROM orders
              ORDER BY k""")),

    // Bag-semantics set ops (multiplicity-preserving): a customer with 5
    // orders and 3 events keeps min(5,3) rows under INTERSECT ALL and
    // 5-3 under EXCEPT ALL — both engines implement the same SQL bag rules.
    Q("g4_bag_setops",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey").as("k"))
        val e = Tables.events(s, d)
          .select((col("user_id") % 1500 + 1).as("k"))
        o.intersectAll(e).groupBy("k").agg(count(lit(1)).as("n_inter"))
          .join(
            o.exceptAll(e).groupBy("k").agg(count(lit(1)).as("n_exc")),
            Seq("k"), "full")
          .select(col("k"),
            coalesce(col("n_inter"), lit(0L)).as("n_inter"),
            coalesce(col("n_exc"), lit(0L)).as("n_exc"))
          .orderBy("k")
      },
      Some("""WITH o AS (SELECT o_custkey AS k FROM orders),
                   e AS (SELECT user_id % 1500 + 1 AS k FROM events),
                   i AS (SELECT k, COUNT(*) AS n_inter FROM
                           (SELECT k FROM o INTERSECT ALL SELECT k FROM e)
                         GROUP BY k),
                   x AS (SELECT k, COUNT(*) AS n_exc FROM
                           (SELECT k FROM o EXCEPT ALL SELECT k FROM e)
                         GROUP BY k)
              SELECT COALESCE(i.k, x.k) AS k,
                     COALESCE(n_inter, 0) AS n_inter,
                     COALESCE(n_exc, 0) AS n_exc
              FROM i FULL OUTER JOIN x ON i.k = x.k
              ORDER BY k"""))
  )
}
