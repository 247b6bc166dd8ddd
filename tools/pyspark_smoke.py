#!/usr/bin/env python3
"""PySpark client smoke: the third client surface.

The engine's query catalog is reachable three ways: the Scala DataFrame
API (SparkEntry.queries), SQL text (the oracle strings, which live in the
Spark-parsable DuckDB-shared dialect), and — this script — a PYTHON
session. It registers the same view catalog through the JVM
(graft.Tables.registerAllViews via py4j), runs TPC-H oracle SQL strings
through the Python session's spark.sql, and differentially compares each
result row-for-row against the Scala DataFrame twin invoked through py4j
— proving client parity with zero new dependencies (pyspark ships in
/opt/spark/python; the engine classes ride the driver classpath).

Usage:
  python3 tools/pyspark_smoke.py [sfDir] [query ...]
defaults: /root/testdata/sf0.001 and the FULL m-tranche (every m*_tpch_*
key in the catalog, discovered through py4j — 21 workloads), plus
ten non-SQL/dialect checks: j1_exact_dedup, j73_random_projection,
j78_scd2_history, a4 DSv2 pushdown, b6 recursive SQL, a6 aggregate
pushdown, n6_ewma (round 15 — the order-pinned HOF fold),
n10_cusum_alarm (round 16 — the struct-accumulator alarm fold), and
a7_time_travel (round 15 — the MVCC versioned table's three
time-travel snapshots vs a native SQL recomputation), and
a9_sql_time_travel (round 16 — the graft_vlog catalog's VERSION AS OF
read through the engine's own DSv2 parquet reader), each
invoked through py4j AND re-composed natively in the PySpark
DataFrame API / SQL, compared row-for-row (non-SQL operators reach
the Python surface both ways, including the vector/HOF family, the
keyed-window family, and the time-series fold family).

Run from the repo root after `sbt compile` (needs
target/scala-2.13/classes on disk).
"""
import glob
import os
import re
import sys

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
sys.path.insert(0, os.path.join(SPARK_HOME, "python"))
sys.path.insert(0, glob.glob(
    os.path.join(SPARK_HOME, "python", "lib", "py4j-*-src.zip"))[0])
os.environ.setdefault("SPARK_HOME", SPARK_HOME)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

CLASSES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "target", "scala-2.13", "classes")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    if not os.path.isdir(CLASSES):
        sys.exit(f"compiled classes not found at {CLASSES} — run sbt compile")
    spark = (SparkSession.builder
             .master("local[4]")
             .appName("graft-pyspark-smoke")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.extraClassPath", CLASSES)
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    jvm = spark._jvm
    # the same catalog the Scala/SQL clients use, registered through py4j
    jvm.graft.Tables.registerAllViews(spark._jsparkSession, sf_dir)
    oracle = jvm.graft.SparkEntry.oracleSql()
    queries = jvm.graft.SparkEntry.queries()
    if not names:
        # the full m-tranche, discovered from the catalog itself so a new
        # workload cannot silently fall out of the smoke
        allq = jvm.graft.SparkEntry.all()
        catalog = [allq.apply(i).name() for i in range(allq.size())]
        names = [n for n in catalog if re.match(r"m\d+_tpch", n)]
    failures = 0
    for name in names:
        sql = oracle.apply(name)
        py_rows = sorted(map(tuple, spark.sql(sql).collect()))
        jdf = queries.apply(name).apply(spark._jsparkSession, sf_dir)
        sc_rows = sorted(map(tuple, DataFrame(jdf, spark).collect()))
        # m14 (TPC-H q22) is legitimately EMPTY in this generator's data
        # (the driver's oracle gate records 0 == 0 for it too), so equality
        # decides the verdict; empty matches are labeled distinctly rather
        # than counted as silent passes.
        ok = py_rows == sc_rows
        failures += 0 if ok else 1
        verdict = ("MATCH(empty)" if ok and not py_rows
                   else "MATCH" if ok else "MISMATCH")
        print(f"[pyspark-smoke] {name}: python-sql rows={len(py_rows)} "
              f"scala-df rows={len(sc_rows)} {verdict}")
        if not ok:
            print(f"  first python row: {py_rows[:1]}")
            print(f"  first scala  row: {sc_rows[:1]}")
    # Non-SQL LLM operator on the Python surface, both directions:
    # the catalog entry invoked through py4j, and the SAME operator
    # re-composed natively with pyspark.sql.functions — row-for-row equal.
    from pyspark.sql import Window, functions as F
    j_name = "j1_exact_dedup"
    jdf = queries.apply(j_name).apply(spark._jsparkSession, sf_dir)
    via_jvm = sorted(map(tuple, DataFrame(jdf, spark).collect()))
    w = Window.partitionBy("h").orderBy("doc_id")
    native = (spark.table("documents")
              .withColumn("h", F.sha2(F.col("text"), 256))
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select("doc_id", "lang", "source", "n_chars")
              .orderBy("doc_id"))
    via_py = sorted(map(tuple, native.collect()))
    j_ok = via_jvm == via_py and len(via_jvm) > 0
    failures += 0 if j_ok else 1
    print(f"[pyspark-smoke] {j_name}: py4j rows={len(via_jvm)} "
          f"native-pyspark rows={len(via_py)} "
          f"{'MATCH' if j_ok else 'MISMATCH'}")
    # A round-13 vector operator the same two ways: the signed random
    # projection (j73) re-composed natively — the whole op is built-in
    # HOFs + a broadcast cross join, so the Python surface can express it
    # verbatim with zero JVM helpers.
    j73 = "j73_random_projection"
    jdf73 = queries.apply(j73).apply(spark._jsparkSession, sf_dir)
    via_jvm73 = sorted(map(tuple, DataFrame(jdf73, spark).collect()))
    qe = spark.table("embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(round(cast(x as double)"
               " * 1000000) as bigint))").alias("qv"))
    m = (spark.range(0, 16).toDF("j")
         .withColumn("srow", F.expr(
             "transform(sequence(1, 64), i -> CASE WHEN substring("
             "md5(concat(cast(j as string), '_', cast(i as string))), 1, 1)"
             " >= '8' THEN 1L ELSE -1L END)")))
    native73 = (qe.crossJoin(F.broadcast(m))
                .select("vec_id", "j",
                        F.expr("aggregate(zip_with(qv, srow,"
                               " (x, sg) -> x * sg), 0L,"
                               " (a, x) -> a + x)").alias("proj"))
                .withColumn("srp_bit", F.col("proj") >= 0)
                .orderBy("vec_id", "j"))
    via_py73 = sorted(map(tuple, native73.collect()))
    j73_ok = via_jvm73 == via_py73 and len(via_jvm73) > 0
    failures += 0 if j73_ok else 1
    print(f"[pyspark-smoke] {j73}: py4j rows={len(via_jvm73)} "
          f"native-pyspark rows={len(via_py73)} "
          f"{'MATCH' if j73_ok else 'MISMATCH'}")
    # A round-14 windowed operator the same two ways: the SCD2 history
    # (j78) re-composed natively — gaps-and-islands is lag/lead/row_number
    # over one keyed window spec, all present in pyspark.sql.functions.
    j78 = "j78_scd2_history"
    jdf78 = queries.apply(j78).apply(spark._jsparkSession, sf_dir)
    # valid_to is None on every current version — sort with a None-safe
    # key or sorted() raises TypeError mid-smoke instead of MISMATCH
    none_safe = lambda t: tuple("" if v is None else v for v in t)  # noqa: E731
    via_jvm78 = sorted(map(tuple, DataFrame(jdf78, spark).collect()),
                       key=none_safe)
    w78 = Window.partitionBy("custkey").orderBy("ts", "ok")
    o78 = spark.table("orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"))
    native78 = (o78.withColumn("prev", F.lag("status", 1).over(w78))
                .filter(F.col("prev").isNull()
                        | (F.col("prev") != F.col("status")))
                .select("custkey", "status",
                        F.date_format("ts", "yyyy-MM-dd")
                        .alias("valid_from"),
                        F.date_format(F.lead("ts", 1).over(w78),
                                      "yyyy-MM-dd").alias("valid_to"),
                        F.row_number().over(w78).cast("long")
                        .alias("version"))
                .orderBy("custkey", "version"))
    via_py78 = sorted(map(tuple, native78.collect()), key=none_safe)
    j78_ok = via_jvm78 == via_py78 and len(via_jvm78) > 0
    failures += 0 if j78_ok else 1
    print(f"[pyspark-smoke] {j78}: py4j rows={len(via_jvm78)} "
          f"native-pyspark rows={len(via_py78)} "
          f"{'MATCH' if j78_ok else 'MISMATCH'}")
    # The round-14 custom DataSource V2 from the PYTHON surface: the same
    # format("graft-docgen") read re-composed natively — the short name
    # resolves through META-INF/services on the driver classpath, and
    # pushdown/pruning happen inside the JVM source regardless of client
    # language.
    a4 = "a4_dsv2_pushdown"
    jdfa4 = queries.apply(a4).apply(spark._jsparkSession, sf_dir)
    via_jvma4 = sorted(map(tuple, DataFrame(jdfa4, spark).collect()))
    nativea4 = (spark.read.format("graft-docgen")
                .option("rows", "10000").option("partitions", "8").load()
                .filter((F.col("doc_id") >= 2500) & (F.col("doc_id") < 7500))
                .filter(F.col("lang") == "en")
                .select("doc_id", "lang", "n_chars").orderBy("doc_id"))
    via_pya4 = sorted(map(tuple, nativea4.collect()))
    a4_ok = via_jvma4 == via_pya4 and len(via_jvma4) > 0
    failures += 0 if a4_ok else 1
    print(f"[pyspark-smoke] {a4}: py4j rows={len(via_jvma4)} "
          f"native-pyspark rows={len(via_pya4)} "
          f"{'MATCH' if a4_ok else 'MISMATCH'}")
    # Round-14 SQL surface from Python: Spark 4's recursive CTE — the
    # Spark-dialect text (DIV) through the Python session's spark.sql vs
    # the catalog entry through py4j.
    b6 = "b6_recursive_cte"
    jdfb6 = queries.apply(b6).apply(spark._jsparkSession, sf_dir)
    via_jvmb6 = sorted(map(tuple, DataFrame(jdfb6, spark).collect()))
    via_pyb6 = sorted(map(tuple, spark.sql("""
        WITH RECURSIVE chain(custkey, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer
          WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, ch.root, ch.depth + 1
          FROM customer c JOIN chain ch ON c.c_custkey DIV 10 = ch.custkey
          WHERE c.c_custkey >= 10
        )
        SELECT depth, COUNT(*) AS n_members,
               COUNT(DISTINCT root) AS n_roots,
               CAST(SUM(custkey) AS BIGINT) AS key_sum
        FROM chain GROUP BY depth ORDER BY depth""").collect()))
    b6_ok = via_jvmb6 == via_pyb6 and len(via_jvmb6) > 0
    failures += 0 if b6_ok else 1
    print(f"[pyspark-smoke] {b6}: py4j rows={len(via_jvmb6)} "
          f"python-sql rows={len(via_pyb6)} "
          f"{'MATCH' if b6_ok else 'MISMATCH'}")
    # Round-14 aggregate pushdown from Python: the closed-form scan serves
    # the native pyspark aggregation too (the pushdown negotiation happens
    # in the JVM source, client language irrelevant).
    a6 = "a6_agg_pushdown"
    jdfa6 = queries.apply(a6).apply(spark._jsparkSession, sf_dir)
    via_jvma6 = sorted(map(tuple, DataFrame(jdfa6, spark).collect()))
    nativea6 = (spark.read.format("graft-docgen")
                .option("rows", "100000000").option("partitions", "8").load()
                .filter((F.col("doc_id") >= 12345) &
                        (F.col("doc_id") < 90000000))
                .agg(F.count(F.col("doc_id")).alias("n_rows"),
                     F.min(F.col("doc_id")).alias("min_id"),
                     F.max(F.col("doc_id")).alias("max_id"),
                     F.sum(F.col("doc_id")).alias("sum_id")))
    via_pya6 = sorted(map(tuple, nativea6.collect()))
    a6_ok = via_jvma6 == via_pya6 and len(via_jvma6) == 1
    failures += 0 if a6_ok else 1
    print(f"[pyspark-smoke] {a6}: py4j rows={len(via_jvma6)} "
          f"native-pyspark rows={len(via_pya6)} "
          f"{'MATCH' if a6_ok else 'MISMATCH'}")
    # Round-15 time-series operator from Python: the per-user EWMA (n6)
    # re-composed natively — the order-pinned fold is built-in HOFs
    # (sort_array/collect_list/aggregate), so the Python surface expresses
    # it verbatim and must land on the SAME doubles.
    n6 = "n6_ewma"
    jdfn6 = queries.apply(n6).apply(spark._jsparkSession, sf_dir)
    via_jvmn6 = sorted(map(tuple, DataFrame(jdfn6, spark).collect()))
    nativen6 = (spark.table("events")
                .groupBy("user_id")
                .agg(F.expr("transform(sort_array(collect_list("
                            "struct(ts, event_id, value))), r -> r.value)")
                     .alias("vs"))
                .select(F.col("user_id"),
                        F.size("vs").cast("long").alias("n_events"),
                        F.round(F.expr(
                            "aggregate(slice(vs, 2, size(vs) - 1), "
                            "element_at(vs, 1), (a, x) -> "
                            "CAST(0.75 AS DOUBLE) * a "
                            "+ CAST(0.25 AS DOUBLE) * x)"), 6)
                        .alias("ewma"))
                .orderBy("user_id"))
    via_pyn6 = sorted(map(tuple, nativen6.collect()))
    n6_ok = via_jvmn6 == via_pyn6 and len(via_jvmn6) > 0
    failures += 0 if n6_ok else 1
    print(f"[pyspark-smoke] {n6}: py4j rows={len(via_jvmn6)} "
          f"native-pyspark rows={len(via_pyn6)} "
          f"{'MATCH' if n6_ok else 'MISMATCH'}")
    # Round-16 monitoring operator from Python: the CUSUM drift alarm
    # (n10) re-composed natively — the struct-accumulator fold is built-in
    # HOFs too, so the alarm-and-reset branch reaches Python verbatim and
    # must land on the same (alarms, cusum) pairs.
    n10 = "n10_cusum_alarm"
    jdfn10 = queries.apply(n10).apply(spark._jsparkSession, sf_dir)
    via_jvmn10 = sorted(map(tuple, DataFrame(jdfn10, spark).collect()))
    nativen10 = (spark.table("events")
                 .groupBy("user_id")
                 .agg(F.expr("transform(sort_array(collect_list("
                             "struct(ts, event_id, value))), r -> r.value)")
                      .alias("vs"))
                 .select(F.col("user_id"),
                         F.size("vs").cast("long").alias("n_events"),
                         F.expr(
                             "aggregate(vs, named_struct('s', "
                             "CAST(0 AS DOUBLE), 'a', CAST(0 AS BIGINT)), "
                             "(acc, x) -> CASE WHEN greatest("
                             "CAST(0 AS DOUBLE), acc.s + x - "
                             "CAST(60 AS DOUBLE)) > CAST(80 AS DOUBLE) "
                             "THEN named_struct('s', CAST(0 AS DOUBLE), "
                             "'a', acc.a + CAST(1 AS BIGINT)) "
                             "ELSE named_struct('s', greatest("
                             "CAST(0 AS DOUBLE), acc.s + x - "
                             "CAST(60 AS DOUBLE)), 'a', acc.a) END)")
                         .alias("st"))
                 .select(F.col("user_id"), F.col("n_events"),
                         F.col("st.a").alias("alarms"),
                         F.round(F.col("st.s"), 6).alias("cusum_final"))
                 .orderBy("user_id"))
    via_pyn10 = sorted(map(tuple, nativen10.collect()))
    n10_ok = via_jvmn10 == via_pyn10 and len(via_jvmn10) > 0
    failures += 0 if n10_ok else 1
    print(f"[pyspark-smoke] {n10}: py4j rows={len(via_jvmn10)} "
          f"native-pyspark rows={len(via_pyn10)} "
          f"{'MATCH' if n10_ok else 'MISMATCH'}")
    # Round-15 versioned table from Python: the a7 time-travel entry
    # (MVCC commit log + COW merge/delete, built and time-travel-read
    # through py4j) vs a native python-sql recomputation of the three
    # snapshots' contents from the raw documents view — the Python
    # client sees the same table history the Scala client wrote.
    a7 = "a7_time_travel"
    jdfa7 = queries.apply(a7).apply(spark._jsparkSession, sf_dir)
    via_jvma7 = sorted(map(tuple, DataFrame(jdfa7, spark).collect()))
    via_pya7 = sorted(map(tuple, spark.sql("""
        WITH v0 AS (SELECT doc_id, lang, n_chars FROM documents
                    WHERE doc_id % 3 <> 0),
             v1 AS (SELECT doc_id, lang, n_chars FROM v0
                    WHERE doc_id % 5 <> 0
                    UNION ALL
                    SELECT doc_id, lang, n_chars + 1000 FROM documents
                    WHERE doc_id % 5 = 0),
             v2 AS (SELECT * FROM v1 WHERE lang <> 'de')
        SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(sum(doc_id) AS BIGINT) AS id_sum FROM v0
        UNION ALL
        SELECT CAST(1 AS BIGINT), count(*), CAST(sum(n_chars) AS BIGINT),
               CAST(sum(doc_id) AS BIGINT) FROM v1
        UNION ALL
        SELECT CAST(2 AS BIGINT), count(*), CAST(sum(n_chars) AS BIGINT),
               CAST(sum(doc_id) AS BIGINT) FROM v2
        ORDER BY version""").collect()))
    a7_ok = via_jvma7 == via_pya7 and len(via_jvma7) == 3
    failures += 0 if a7_ok else 1
    print(f"[pyspark-smoke] {a7}: py4j rows={len(via_jvma7)} "
          f"python-sql rows={len(via_pya7)} "
          f"{'MATCH' if a7_ok else 'MISMATCH'}")

    # a9 (round 16): the VERSION AS OF catalog surface — the py4j query
    # runs the engine's own DSv2 reader over graft_vlog.`dir`; python
    # recomputes the v1 snapshot natively from raw documents. Proves the
    # catalog + time-travel + custom parquet reader reach the Python
    # client unchanged.
    a9 = "a9_sql_time_travel"
    jdfa9 = queries.apply(a9).apply(spark._jsparkSession, sf_dir)
    via_jvma9 = sorted(map(tuple, DataFrame(jdfa9, spark).collect()))
    via_pya9 = sorted(map(tuple, spark.sql("""
        WITH v0 AS (SELECT doc_id, lang, n_chars FROM documents
                    WHERE doc_id % 3 <> 0),
             v1 AS (SELECT doc_id, lang, n_chars FROM v0
                    WHERE doc_id % 5 <> 0
                    UNION ALL
                    SELECT doc_id, lang, n_chars + 1000 FROM documents
                    WHERE doc_id % 5 = 0)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM v1 GROUP BY lang ORDER BY lang""").collect()))
    a9_ok = via_jvma9 == via_pya9 and len(via_jvma9) > 0
    failures += 0 if a9_ok else 1
    print(f"[pyspark-smoke] {a9}: py4j rows={len(via_jvma9)} "
          f"python-sql rows={len(via_pya9)} "
          f"{'MATCH' if a9_ok else 'MISMATCH'}")
    # a14/a13 (round 17): maintenance procedures + aggregate pushdown
    # through the Python client — stage a vlog table via the JVM writer,
    # run CALL compact + CALL vacuum as PYTHON SQL text, then read it
    # back with a filterless aggregate (which pushes into the footer
    # scan) and prove the maintenance cycle preserved contents exactly.
    import tempfile
    vdir = tempfile.mkdtemp(prefix="graft-vlog-smoke")
    vt = spark._jvm.graft.sources.VersionedTable
    docs = spark.sql("SELECT doc_id, lang, n_chars FROM documents")
    vt.append(docs.filter("doc_id % 2 = 0")._jdf, vdir)
    vt.append(docs.filter("doc_id % 2 = 1")._jdf, vdir)
    spark.conf.set("spark.sql.catalog.graft_vlog",
                   "graft.sources.VlogCatalog")
    crow = spark.sql(
        f"CALL graft_vlog.compact('{vdir}', 'doc_id', 2)").collect()[0]
    vrow = spark.sql(
        f"CALL graft_vlog.vacuum(table => '{vdir}', retention_ms => 0)"
    ).collect()[0]
    agg = ("SELECT COUNT(*) AS n, MIN(doc_id) AS lo, MAX(doc_id) AS hi, "
           "CAST(SUM(n_chars) AS BIGINT) AS sc FROM ")
    got = spark.sql(agg + f"graft_vlog.`{vdir}`").collect()[0]
    want = spark.sql(agg + "documents").collect()[0]
    proc_ok = (tuple(got) == tuple(want) and crow["version"] == 2
               and crow["files_after"] <= 2 and vrow["files_reclaimed"] >= 2)
    failures += 0 if proc_ok else 1
    print(f"[pyspark-smoke] a14_sql_maintenance+a13_agg_push: "
          f"call=(v{crow['version']}, {crow['files_after']} files, "
          f"{vrow['files_reclaimed']} reclaimed) agg={tuple(got)} "
          f"{'MATCH' if proc_ok else 'MISMATCH'}")
    n_total = len(names) + 11
    spark.stop()
    print(f"[pyspark-smoke] {n_total - failures}/{n_total} matched")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
