#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark result), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same sfDir tables, and diffs: column names, row counts, dtypes, and
values (exact; floats compared bit-for-bit after canonicalization).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    # scalar NaT/NaN/None equivalence (pd.isna on scalars only)
    try:
        na_a, na_b = pd.isna(a), pd.isna(b)
        if isinstance(na_a, bool) and isinstance(na_b, bool):
            if na_a and na_b:
                return True
            if na_a != na_b:
                return False
    except (ValueError, TypeError):
        pass
    # NaN/None equivalence
    try:
        if a is None or b is None:
            fa = a if a is not None else float("nan")
            fb = b if b is not None else float("nan")
            if isinstance(fa, float) and isinstance(fb, float):
                return math.isnan(fa) and math.isnan(fb)
            return False
    except Exception:
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    try:
        return bool(a == b)
    except Exception:
        return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(
                "SELECT * FROM read_parquet([" +
                ",".join(f"'{f}'" for f in files) + "])").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark parquet: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        errs = []
        # The driver's harness sorts rows with pandas sort_values, which
        # crashes on array-typed cells ("unhashable type: numpy.ndarray").
        # Flag such columns locally so they never reach the driver.
        if len(got):
            for c in got.columns:
                v = got[c].iloc[0]
                if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
                    errs.append(f"driver-incompatible array-typed output column: {c}")
        if sorted(got.columns) != sorted(exp.columns):
            errs.append(f"cols spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
        elif len(got) != len(exp):
            errs.append(f"rows spark={len(got)} oracle={len(exp)}")
        else:
            g, e = canon(got), canon(exp)
            for c in g.columns:
                if str(g[c].dtype) != str(e[c].dtype):
                    errs.append(f"dtype[{c}] spark={g[c].dtype} oracle={e[c].dtype}")
            bad = 0
            for c in g.columns:
                gv, ev = g[c].tolist(), e[c].tolist()
                for i in range(len(gv)):
                    if not cell_eq(gv[i], ev[i]):
                        if bad < 3:
                            errs.append(f"val[{c}][row {i}] spark={gv[i]!r} oracle={ev[i]!r}")
                        bad += 1
            if bad > 3:
                errs.append(f"... {bad} value mismatches total")
        if errs:
            print(f"FAIL {name} ({len(got)} rows)")
            for m in errs[:8]:
                print(f"     {m}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    missing = set(oracle) - {name for name in oracle}
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} total oracle queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
