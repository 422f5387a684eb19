#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the engine):
runs each oracle SQL in DuckDB over the same parquet tables and compares with
the parquet dumps Verify wrote. Usage:
    python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

import datetime

def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical-STRING frame, dtype-sensitive like the driver's hash:
    int64 576600 renders '576600' but float64 renders '576600.0', so a
    DuckDB HUGEINT/DECIMAL leak (-> pandas float64) FAILS against a Spark
    int column instead of being masked by a numeric compare (the round-13
    q225/q230 defect class)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        first = s.dropna().iloc[0] if s.notna().any() else None
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object and isinstance(first, (datetime.date, datetime.datetime)):
            # parquet DATE loads as datetime.date objects; DuckDB DATE loads
            # as datetime64 — normalize both to the same string form
            df[c] = pd.to_datetime(s).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.map(lambda v: None if pd.isna(v) else str(bool(v)))
        elif pd.api.types.is_float_dtype(s):
            # +0.0 folds -0.0 into 0.0 (equal under the old exact compare);
            # repr keeps full precision so exactness is preserved
            df[c] = s.map(lambda v: None if pd.isna(v) else repr(float(v) + 0.0))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.map(lambda v: None if pd.isna(v) else str(int(v)))
        else:
            df[c] = s.map(lambda v: None if v is None else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

# DuckDB types that silently widen past the parquet type system: a SUM(BIGINT)
# is HUGEINT, which pandas renders float64 and the driver hashes as '...0'.
WIDE_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

def wide_oracle_cols(con, sql):
    """Columns of the oracle result whose DuckDB type leaks past BIGINT —
    each needs an explicit CAST in the oracle SQL."""
    try:
        desc = con.sql(f"DESCRIBE ({sql})").df()
    except Exception:
        return []
    return [f"{r.column_name}:{r.column_type}" for r in desc.itertuples()
            if any(t in str(r.column_type).upper() for t in WIDE_ORACLE_TYPES)]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed, skipped = [], [], []
    for name in sorted(os.listdir(out_dir)):
        p = f"{out_dir}/{name}"
        if not os.path.isdir(p):
            continue
        if only and name not in only:
            continue
        if name not in oracle:
            n = len(glob.glob(f"{p}/*.parquet"))
            skipped.append(name)
            continue
        try:
            got = pd.read_parquet(p)
            want = con.sql(oracle[name]).df()
        except Exception as e:
            failed.append((name, f"load/exec error: {e}"))
            continue
        if sorted(got.columns) != sorted(want.columns):
            failed.append((name, f"columns: spark={sorted(got.columns)} oracle={sorted(want.columns)}"))
            continue
        if len(got) != len(want):
            failed.append((name, f"rows: spark={len(got)} oracle={len(want)}"))
            continue
        wide = wide_oracle_cols(con, oracle[name])
        if wide:
            failed.append((name, f"oracle type leak (add CAST .. AS BIGINT): {wide}"))
            continue
        g, w = canon(got), canon(want)
        try:
            pd.testing.assert_frame_equal(g, w, check_exact=True)
            passed.append(name)
        except AssertionError as e:
            diff = (g != w) & ~(g.isna() & w.isna())
            cols = [c for c in g.columns if diff[c].any()]
            idx = diff.any(axis=1)
            sample = pd.concat([g.loc[idx, cols].head(3).add_suffix("_spark"),
                                w.loc[idx, cols].head(3).add_suffix("_oracle")], axis=1)
            failed.append((name, f"values differ in {cols}:\n{sample}"))
    print(f"PASS {len(passed)}: {' '.join(passed)}")
    print(f"SKIP (no oracle) {len(skipped)}: {' '.join(skipped)}")
    print(f"FAIL {len(failed)}:")
    for n, msg in failed:
        print(f"--- {n}: {msg}")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
