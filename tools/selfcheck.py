#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata parquet and compare with the Verify.scala
parquet dumps (columns sorted by name, values compared exactly; float
near-misses reported with max-abs-diff so rounding-grid issues are
visible). Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, struct, sys
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            results[name] = f"SPARK-MISSING {e}"
            continue
        results[name] = compare(exp, got)
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'FAIL'} {name}: {v}")
    print(f"\n{n_ok}/{len(results)} oracle queries match")
    return 0 if n_ok == len(results) else 1

def compare(exp, got):
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        return f"COLUMNS exp={list(exp.columns)} got={list(got.columns)}"
    if len(exp) != len(got):
        return f"ROWS exp={len(exp)} got={len(got)}"
    bad = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        if e.dtype.kind == "f" or g.dtype.kind == "f":
            # Bitwise compare, mirroring the driver's hash gate exactly:
            # -0.0 != +0.0, NaN == NaN (same bit pattern after float64
            # canonicalization). A plain `==` here let a real -0.0 vs +0.0
            # driver failure (x23, rounds 3-4) pass locally — never again.
            ee = e.astype(np.float64); gg = g.astype(np.float64)
            ea = ee.to_numpy().copy(); ga = gg.to_numpy().copy()
            ea[np.isnan(ea)] = np.nan  # canonical quiet-NaN bit pattern
            ga[np.isnan(ga)] = np.nan
            neq = ea.view(np.uint64) != ga.view(np.uint64)
            if neq.any():
                # maxabs over the FINITE diffs only: when every differing
                # cell pairs a NaN with a value, abs(e-g) is all-NaN and
                # np.nanmax would warn on an all-NaN slice and print
                # maxabs=nan; nan-vs-value mismatches are counted separately
                d = np.abs(ee.to_numpy()[neq] - gg.to_numpy()[neq])
                fin = d[np.isfinite(d)]
                nanv = int(np.sum(np.isnan(ea[neq]) != np.isnan(ga[neq])))
                # inf-vs-value (and inf-vs-inf-of-other-sign) cells have a
                # non-finite diff but are NOT nan-vs-value — without this
                # bucket a column whose only diffs involve inf shows
                # maxabs=n/a, nan-vs-value=0 and looks unquantified
                nonfin = int(np.sum(~np.isfinite(d))) - nanv
                maxabs = f"{np.max(fin):.3e}" if fin.size else "n/a"
                first = int(np.argmax(neq))
                bad.append(f"{c}: {int(neq.sum())} cells differ bitwise,"
                           f" maxabs={maxabs}, nan-vs-value={nanv},"
                           f" inf-diff={nonfin}"
                           f" (first at row {first}:"
                           f" exp={ee.iloc[first]!r} got={gg.iloc[first]!r})")
        else:
            ee = e.astype(object).where(~e.isna(), None)
            gg = g.astype(object).where(~g.isna(), None)
            neq = [i for i, (a, b) in enumerate(zip(ee, gg)) if not _eq(a, b)]
            if neq:
                i = neq[0]
                bad.append(f"{c}: {len(neq)} cells differ (first at row {i}:"
                           f" exp={ee.iloc[i]!r} got={gg.iloc[i]!r})")
    return "OK" if not bad else "; ".join(bad)

def _eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return struct.pack("<d", a) == struct.pack("<d", b)
    # arrays/lists from duckdb vs spark parquet
    if hasattr(a, "__len__") and hasattr(b, "__len__") and not isinstance(a, str):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
