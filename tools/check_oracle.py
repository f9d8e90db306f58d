#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB against views over <sfDir>/*.parquet, and
compares: row count, sorted column names, and values (exact for
ints/strings/dates, bit-exact for floats with a diff report on mismatch).

Dev tool only — not part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            ok = False
            msgs.append(f"columns differ: spark={gcols} oracle={wcols}")
        if len(got) != len(want):
            ok = False
            msgs.append(f"rowcount differ: spark={len(got)} oracle={len(want)}")
        if ok:
            g = got[gcols]
            w = want[wcols]
            for c in gcols:
                gv, wv = list(g[c]), list(w[c])
                bad = 0
                first = None
                for i, (a, b) in enumerate(zip(gv, wv)):
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                        if a != b:
                            bad += 1
                            if first is None:
                                first = (i, a, b, abs(a - b))
                    elif str(a) != str(b):
                        bad += 1
                        if first is None:
                            first = (i, a, b, None)
                if bad:
                    ok = False
                    msgs.append(f"col {c}: {bad} mismatches, first={first}")
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
