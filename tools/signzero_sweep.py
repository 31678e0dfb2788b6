#!/usr/bin/env python3
"""Sign-zero audit of the whole oracle contract: scan every float column of
the Verify parquet dumps AND the corresponding DuckDB oracle results for
-0.0 cells. A -0.0 on either side is a latent driver hash failure (the
driver compares bitwise; Spark's BigDecimal round can never emit -0.0, and
the two engines' arithmetic reaches exact zero from different directions)
— apply the `+ 0.0` normalization discipline (QueryDef scaladoc) wherever
this reports a hit. Exit 0 = zero -0.0 cells anywhere, both sides.

Usage: signzero_sweep.py <sfDir> <verifyOutDir>
"""
import json, sys
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def neg_zero_cols(df):
    hits = {}
    for c in df.columns:
        if df[c].dtype.kind != "f":
            continue
        v = df[c].astype(np.float64).to_numpy()
        n = int(np.sum(np.signbit(v) & (v == 0.0)))
        if n:
            hits[c] = n
    return hits


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    total = 0
    for name, sql in sorted(oracle.items()):
        for side, fetch in (
                ("oracle", lambda: con.execute(sql).fetchdf()),
                ("spark", lambda: con.execute(
                    f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())):
            try:
                hits = neg_zero_cols(fetch())
            except Exception as e:
                print(f"SKIP {name} [{side}]: {e}")
                continue
            for c, n in hits.items():
                print(f"NEGZERO {name} [{side}] {c}: {n} cells")
                total += n
    print(f"\n{total} -0.0 cells across the contract"
          f" ({'CLEAN' if total == 0 else 'APPLY + 0.0 DISCIPLINE'})")
    return 0 if total == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
