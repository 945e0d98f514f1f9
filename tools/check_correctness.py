#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sf parquet
tables, and compares: row count, column names, and value hash (columns
sorted by name, rows sorted by all columns, exact equality).
"""
import json
import math
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("\x01".join(norm(r[i]) for i in order))
    out.sort()
    return "\n".join(out)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_weak = 0
    for name in sorted(oracle.keys() | set(
            p.name for p in __import__("pathlib").Path(out_dir).iterdir()
            if p.is_dir())):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows = got.fetchall()
            gcols = [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "WEAK" if len(grows) > 0 else "WEAK-EMPTY"
            print(f"{status} {name}: rows={len(grows)} (no oracle)")
            n_weak += 1
            continue
        try:
            t0 = time.time()
            exp = con.execute(oracle[name])
            erows = exp.fetchall()
            ecols = [d[0] for d in exp.description]
            dt = time.time() - t0
            if dt > 5:
                # the r9 round was zeroed by oracle WALL TIME, not a wrong
                # answer — surface the tail so budget creep is visible
                print(f"SLOW-ORACLE {name}: {dt:.1f}s")
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(gcols) != sorted(ecols):
            problems.append(f"cols spark={sorted(gcols)} duck={sorted(ecols)}")
        else:
            # DuckDB-visible type compare: python fetchall() hides e.g.
            # HUGEINT-vs-BIGINT or TIMESTAMP_NS-vs-TIMESTAMP divergences
            # that the driver's arrow/pandas-based hash does NOT hide
            # (pl_sessionize failed r02 exactly this way). Exact match
            # required — fix the oracle SQL or the Spark output type.
            try:
                gt = {r[0]: r[1] for r in con.execute(
                    f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'"
                ).fetchall()}
                et = {r[0]: r[1] for r in con.execute(
                    f"DESCRIBE {oracle[name]}").fetchall()}
                tdiff = [f"{c}: spark={gt[c]} duck={et[c]}"
                         for c in sorted(gt) if gt[c] != et.get(c)]
                if tdiff:
                    problems.append("type mismatch " + "; ".join(tdiff))
            except Exception as e:
                problems.append(f"type compare errored: {e}")
        if len(grows) != len(erows):
            problems.append(f"rows spark={len(grows)} duck={len(erows)}")
        if not problems:
            gd = table_digest(gcols, grows)
            ed = table_digest(ecols, erows)
            if gd != ed:
                # find first differing line for debugging
                for i, (a, b) in enumerate(
                        zip(gd.split("\n"), ed.split("\n"))):
                    if a != b:
                        problems.append(
                            f"hash mismatch at sorted-row {i}:\n"
                            f"    spark: {a[:200]}\n    duck : {b[:200]}")
                        break
                else:
                    problems.append("hash mismatch (length)")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
