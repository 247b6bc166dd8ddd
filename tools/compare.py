#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (SURVEY §3.4).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against views
over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name on both sides, and compares
values row by row (exact equality — same bar as a hash match).
"""
import json
import re
import sys
import glob
import math

import duckdb

# Table views derive from <sfDir>/*.parquet at runtime (see main) — no
# hand-maintained name list to drift from Tables.names on the Spark side.

# The clustering queries get a SECOND, cheap oracle: union-find over the
# exact near-dup pair set, computed IN DUCKDB by j2's prefix-filtered
# oracle SQL (banded since round 7 — feasible at any sf, so the pair set
# no longer bootstraps from j2's own Spark output). This checks the
# connected-components + min-label step independently of Spark's two CC
# implementations at ANY sf. When a cluster query is on the skip list only
# the (slow recursive-CTE) SQL oracle is skipped; the union-find check
# still runs and must pass — EXCEPT on subset runs whose oracle_sql.json
# omits j2's SQL (the pair-set source), where it is skipped with a loud
# WARN and only the query's own SQL oracle decides.
CLUSTER_QUERIES = {"j13_dedup_clusters", "j30_cc_bigstar"}
# j84 (quality-aware survivor) gets the same treatment with its own
# union-find + quality-argmax checker — see check_survivors.
SURVIVOR_QUERY = "j84_dedup_survivor"
PAIRS_QUERY = "j2_minhash_neardup"
_pairs_cache = {}


def oracle_pairs(con, oracle):
    """Exact (doc_a, doc_b) near-dup pairs via j2's DuckDB oracle SQL —
    engine-independent of Spark. Cached: one build per compare run."""
    if "pairs" not in _pairs_cache:
        _pairs_cache["pairs"] = [
            (r[0], r[1]) for r in con.execute(oracle[PAIRS_QUERY]).fetchall()]
    return _pairs_cache["pairs"]


def union_find_clusters(con, sf_dir, oracle):
    """(doc_id, cluster_id, is_canonical) by doc_id — the j13/j30 contract,
    derived by union-find over the DuckDB-computed verified pair set."""
    pairs = oracle_pairs(con, oracle)
    ids = [r[0] for r in con.execute(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet') "
        f"ORDER BY doc_id").fetchall()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # always hang the larger root under the smaller: every root is
            # then the min id of its component, i.e. the cluster_id
            parent[max(ra, rb)] = min(ra, rb)
    return [(i, find(i), i == find(i)) for i in ids]


def check_survivors(con, sf_dir, out_dir, name, oracle):
    """None if the spark output matches the union-find + quality-argmax
    oracle (the j84 contract: survivor = max quality, min doc_id tiebreak,
    within each near-dup cluster), else a failure description. Independent
    of Spark's CC implementation AND of the recursive-CTE SQL oracle.
    Cluster assignment comes from the SAME union_find_clusters the j13/j30
    checks use (one disjoint-set implementation to keep in lockstep);
    this only layers the quality argmax on top."""
    clusters = union_find_clusters(con, sf_dir, oracle)
    quality = dict(con.execute(
        f"SELECT doc_id, CAST((len(list_distinct(string_split(text, ' ')))"
        f" * 1000000) // len(string_split(text, ' ')) AS BIGINT)"
        f" FROM read_parquet('{sf_dir}/documents.parquet')").fetchall())
    members = {}
    for i, root, _ in clusters:
        members.setdefault(root, []).append(i)
    surv = {root: min(ms, key=lambda i: (-quality[i], i))
            for root, ms in members.items()}
    expected = [(i, root, quality[i], surv[root], i == surv[root])
                for i, root, _ in clusters]
    try:
        spark = con.execute(
            f"SELECT doc_id, cluster_id, quality_ppm, survivor_id, kept "
            f"FROM read_parquet('{out_dir}/{name}/*.parquet') "
            f"ORDER BY doc_id").fetchall()
    except Exception as e:
        return f"spark parquet read error: {str(e)[:200]}"
    if len(spark) != len(expected):
        return f"rows uf={len(expected)} spark={len(spark)}"
    for r, (er, sr) in enumerate(zip(expected, spark)):
        if er != (sr[0], sr[1], sr[2], sr[3], bool(sr[4])):
            return f"row {r} differs\n  uf   = {er}\n  spark= {sr}"
    return None


def check_clusters(con, sf_dir, out_dir, name, oracle):
    """None if the spark output matches the union-find oracle, else a
    failure description."""
    expected = union_find_clusters(con, sf_dir, oracle)
    try:
        # explicit ORDER BY: the expected list is doc_id-ordered, and file
        # row order surviving coalesce(1) is not a contract worth relying on
        spark = con.execute(
            f"SELECT doc_id, cluster_id, is_canonical FROM "
            f"read_parquet('{out_dir}/{name}/*.parquet') "
            f"ORDER BY doc_id").fetchall()
    except Exception as e:
        return f"spark parquet read error: {str(e)[:200]}"
    if len(spark) != len(expected):
        return f"rows uf={len(expected)} spark={len(spark)}"
    for r, (er, sr) in enumerate(zip(expected, spark)):
        if er != (sr[0], sr[1], bool(sr[2])):
            return f"row {r} differs\n  uf   = {er}\n  spark= {sr}"
    return None


def type_mismatches(con, sql, out_dir, name):
    """Column-name→(duck_type, spark_type) for columns whose DuckDB oracle
    type differs from the Spark parquet type. The driver's hash is
    type-sensitive (round-10 n4: DuckDB SUM(BIGINT)→HUGEINT hashed
    differently from Spark's BIGINT on equal values), so equal values with
    unequal types is still a driver FAIL — catch it locally."""
    duck_t = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    spark_t = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
    ).fetchall()}
    return {c: (duck_t[c], spark_t[c])
            for c in duck_t if c in spark_t and duck_t[c] != spark_t[c]}


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        t = p.rsplit("/", 1)[-1][: -len(".parquet")]
        # only bare-identifier names become views; a stray dump like
        # part-00000-abc.snappy.parquet is ignored (as the old allowlist
        # would have), not interpolated into CREATE VIEW to crash setup
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        second_oracle = name in CLUSTER_QUERIES or name == SURVIVOR_QUERY
        if second_oracle and PAIRS_QUERY not in oracle:
            # subset runs (Verify's 3rd arg) may omit j2's SQL — then only
            # the query's own SQL oracle runs; say so loudly (and if the
            # query is ALSO on the skip list, nothing validates it at all)
            print(f"WARN {name}: {PAIRS_QUERY} SQL absent — "
                  f"union-find check skipped"
                  + (" AND SQL oracle on the skip list: NOTHING checked"
                     if name in skip else ""))
        if second_oracle and PAIRS_QUERY in oracle:
            checker = (check_survivors if name == SURVIVOR_QUERY
                       else check_clusters)
            err = checker(con, sf_dir, out_dir, name, oracle)
            if err:
                print(f"FAIL {name}: union-find oracle: {err}")
                n_fail += 1
                continue
            if name in skip:  # SQL oracle impractical at this sf
                print(f"PASS {name}: union-find oracle "
                      f"(recursive-CTE SQL oracle skipped)")
                n_pass += 1
                continue
            # fall through: SQL oracle must ALSO pass where feasible
        elif name in skip:
            continue
        sql = oracle[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetchall()
            duck_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark = rel.fetchall()
            spark_cols = [d[0] for d in rel.description]
        except Exception as e:
            print(f"FAIL {name}: spark parquet read error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(duck_cols) != sorted(spark_cols):
            print(f"FAIL {name}: columns differ duck={sorted(duck_cols)} "
                  f"spark={sorted(spark_cols)}")
            n_fail += 1
            continue
        try:
            tmis = type_mismatches(con, sql, out_dir, name)
        except Exception as e:
            tmis = {}
            print(f"WARN {name}: type-parity check error: {str(e)[:200]}")
        if tmis:
            print(f"FAIL {name}: column types differ (driver hash is "
                  f"type-sensitive): {tmis}")
            n_fail += 1
            continue
        if len(duck) != len(spark):
            print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
            n_fail += 1
            continue
        # sort columns by name (driver semantics), keep row order
        dperm = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        sperm = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        bad = None
        for r, (dr, sr) in enumerate(zip(duck, spark)):
            dv = tuple(norm(dr[i]) for i in dperm)
            sv = tuple(norm(sr[i]) for i in sperm)
            if dv != sv:
                bad = (r, dv, sv)
                break
        if bad:
            r, dv, sv = bad
            print(f"FAIL {name}: row {r} differs\n  duck = {dv}\n  spark= {sv}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(duck)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracled")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()))
