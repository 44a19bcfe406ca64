#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify output
parquet, run the corresponding oracle SQL in DuckDB over the same sf tables,
and compare (rows, schema-by-sorted-column-name, values on sorted rows).

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "tolist"):  # numpy arrays from duckdb lists
        return tuple(norm_cell(x) for x in v.tolist())
    return v


def sort_key_cell(x):
    # Quantize floats for the SORT key (consistent with the comparison
    # tolerance): near-tie floats that differ below tolerance would
    # otherwise sort into different positions per engine and report a
    # false positional mismatch. Comparison still uses the full values.
    if isinstance(x, float) and not math.isnan(x):
        return (x is None, "float", f"{x:.6g}")
    return (x is None, str(type(x)), str(x))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple(sort_key_cell(x) for x in r))
    return out


def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(approx_eq(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    import glob
    produced = {p.rstrip("/").split("/")[-1]
                for p in glob.glob(f"{out_dir}/*/")}
    for name in sorted(produced | set(oracle)):
        entry = {}
        results[name] = entry
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            spark_cols = tbl.column_names
            spark_rows = [tuple(r[c] for c in spark_cols)
                          for r in tbl.to_pylist()]
        except Exception as e:
            entry["error"] = f"spark output missing: {e}"
            continue
        if name not in oracle:
            entry["rows"] = len(spark_rows)
            entry["rows_only"] = True
            entry["ok"] = len(spark_rows) > 0
            continue
        try:
            cur = con.execute(oracle[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            entry["error"] = f"oracle failed: {e}"
            continue
        entry["rows_spark"] = len(spark_rows)
        entry["rows_duck"] = len(duck_rows)
        entry["rows_match"] = len(spark_rows) == len(duck_rows)
        entry["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
        if not entry["schema_match"]:
            entry["spark_cols"] = sorted(spark_cols)
            entry["duck_cols"] = sorted(duck_cols)
        if entry["rows_match"] and entry["schema_match"]:
            a = canon(spark_rows, spark_cols)
            b = canon(duck_rows, duck_cols)
            mism = [(x, y) for x, y in zip(a, b) if not approx_eq(x, y)]
            entry["hash_match"] = not mism
            if mism:
                entry["first_mismatch"] = repr(mism[0])[:400]
        entry["ok"] = bool(entry.get("rows_match") and entry.get("schema_match")
                           and entry.get("hash_match"))
    n_ok = sum(1 for e in results.values() if e.get("ok"))
    print(json.dumps(results, indent=1, default=str))
    print(f"\n=== {n_ok}/{len(results)} ok ===")
    for name, e in sorted(results.items()):
        if not e.get("ok"):
            print("FAIL", name, {k: v for k, v in e.items() if k != "ok"})


if __name__ == "__main__":
    main()
