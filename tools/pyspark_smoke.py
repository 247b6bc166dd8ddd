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
defaults: /root/testdata/sf0.001  m1_tpch_q3 m2_tpch_q5 m4_tpch_q6

Run from the repo root after `sbt compile` (needs
target/scala-2.13/classes on disk).
"""
import glob
import os
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
    names = sys.argv[2:] or ["m1_tpch_q3", "m2_tpch_q5", "m4_tpch_q6"]
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
    failures = 0
    for name in names:
        sql = oracle.apply(name)
        py_rows = sorted(map(tuple, spark.sql(sql).collect()))
        jdf = queries.apply(name).apply(spark._jsparkSession, sf_dir)
        sc_rows = sorted(map(tuple, DataFrame(jdf, spark).collect()))
        ok = py_rows == sc_rows and len(py_rows) > 0
        failures += 0 if ok else 1
        print(f"[pyspark-smoke] {name}: python-sql rows={len(py_rows)} "
              f"scala-df rows={len(sc_rows)} "
              f"{'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            print(f"  first python row: {py_rows[:1]}")
            print(f"  first scala  row: {sc_rows[:1]}")
    spark.stop()
    print(f"[pyspark-smoke] {len(names) - failures}/{len(names)} matched")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
