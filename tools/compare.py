#!/usr/bin/env python3
"""Dev-only pre-flight for the driver's correctness gate (NOT part of the
engine): run Verify's parquet dumps against the DuckDB oracle SQL and compare
row-for-row after sorting columns by name and rows by value.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    def key(r):
        return tuple("\0NULL" if v is None else repr(v) for v in r)
    return sorted(rows, key=key)


def driver_sortable(cols, rows):
    """Reproduce the driver's pandas canonicalization: sort_values over every
    column. Array/map cells (numpy arrays, lists, dicts) make this throw
    exactly like the driver's gate does — this pre-flight must fail wherever
    the gate would (round-4 lesson: repr()-sorting passed three queries the
    driver then errored on)."""
    for r in rows:
        for v in r:
            if isinstance(v, (list, tuple, dict, set, bytearray)) or \
                    (type(v).__module__ == "numpy" and getattr(v, "ndim", 0)):
                raise TypeError(f"unhashable cell of type {type(v).__name__}: "
                                "driver's pandas sort_values cannot order it")
    df = pd.DataFrame(rows, columns=cols)
    df.sort_values(by=list(df.columns), inplace=True, kind="mergesort")


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bitwise-exact contract
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify records every crashed query here (round-6 lesson: a crash used
    # to be a silently-missing row); surface each as an explicit FAIL with
    # the recorded engine-side exception, which beats the reader's IO error.
    try:
        errors = json.load(open(f"{out_dir}/errors.json"))
    except FileNotFoundError:
        errors = {}
    failures = 0
    for name, sql in sorted(oracle.items()):
        if name in errors:
            print(f"FAIL {name}: engine crashed: {errors[name]}")
            failures += 1
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            my_cols = [d[0] for d in mine.description]
            my_rows = mine.fetchall()
            oracle_rel = con.execute(sql)
            or_cols = [d[0] for d in oracle_rel.description]
            or_rows = oracle_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        if sorted(my_cols) != sorted(or_cols):
            print(f"FAIL {name}: columns {sorted(my_cols)} != {sorted(or_cols)}")
            failures += 1
            continue
        try:
            driver_sortable(my_cols, my_rows)
            driver_sortable(or_cols, or_rows)
        except Exception as e:
            print(f"FAIL {name}: driver comparator would err: {type(e).__name__}: {e}")
            failures += 1
            continue
        my_ix = [my_cols.index(c) for c in sorted(my_cols)]
        or_ix = [or_cols.index(c) for c in sorted(or_cols)]
        mine_sorted = canon([[r[i] for i in my_ix] for r in my_rows])
        orac_sorted = canon([[r[i] for i in or_ix] for r in or_rows])
        if len(mine_sorted) != len(orac_sorted):
            print(f"FAIL {name}: rowcount {len(mine_sorted)} != {len(orac_sorted)}")
            failures += 1
            continue
        bad = None
        for i, (mr, orr) in enumerate(zip(mine_sorted, orac_sorted)):
            if not all(values_equal(a, b) for a, b in zip(mr, orr)):
                bad = (i, mr, orr)
                break
        if bad:
            i, mr, orr = bad
            print(f"FAIL {name}: row {i}\n  cols:   {sorted(my_cols)}\n  mine:   {mr}\n  oracle: {orr}")
            failures += 1
        else:
            print(f"PASS {name}: {len(mine_sorted)} rows")
    # crashes recorded for queries WITHOUT an oracle entry must fail the
    # pre-flight too — they have no row above to go red — but they are
    # engine crashes, not oracle mismatches, so report them under their own
    # count instead of silently inflating the oracle denominator
    extra_crashes = sorted(set(errors) - set(oracle))
    for name in extra_crashes:
        print(f"FAIL {name} (no oracle): engine crashed: {errors[name]}")
        failures += 1
    oracle_failures = failures - len(extra_crashes)
    summary = f"\n{len(oracle) - oracle_failures}/{len(oracle)} oracle queries match"
    if extra_crashes:
        summary += f" (plus {len(extra_crashes)} engine crashes outside the oracle set)"
    print(summary)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
