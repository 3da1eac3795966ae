#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each parquet dump under
outDir (written by graft.Verify), run the corresponding oracle SQL in DuckDB
over the same sf tables and compare (rows, schema-ish, values).

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints (incl. nullable/decimal) -> int64 when lossless,
    # timestamps -> utc-naive strings, floats stay float64
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            # decimal.Decimal from duckdb hugeint sums
            try:
                df[c] = pd.to_numeric(s)
            except (ValueError, TypeError):
                df[c] = s.astype(str)
    # Sort on a float-rounded copy so low-order float bit differences between
    # engines can't reorder rows and produce spurious cross-row mismatches.
    # The unrounded float columns are appended as trailing tie-break keys so
    # rows that tie on every rounded column still sort deterministically
    # (a stable sort alone would keep engine-dependent input order).
    key = df.copy()
    tiebreak = []
    for c in list(key.columns):
        if pd.api.types.is_float_dtype(key[c]):
            key[f"__raw_{c}"] = key[c]
            tiebreak.append(f"__raw_{c}")
            key[c] = key[c].round(6)
    idx = key.sort_values(by=list(df.columns) + tiebreak, kind="mergesort").index
    df = df.loc[idx].reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    problems = []
    if list(spark_df.columns) != list(duck_df.columns):
        problems.append(f"columns differ: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        # The driver hashes stringified values, so int64 3 vs float64 3.0
        # ("3" vs "3.0") fails its strict hash even though the numbers are
        # equal. DuckDB silently widens HUGEINT (e.g. window sums over
        # BIGINT) to float64 in .df() — catch that class here instead of
        # coercing it away (this exact gap hid the q59 r5 failure).
        if pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b):
            which = "spark" if pd.api.types.is_float_dtype(a) else "duck"
            problems.append(
                f"col {c}: int/float dtype mismatch ({which} side is float: "
                f"spark={a.dtype} duck={b.dtype}) — WOULD FAIL strict hash "
                f"(HUGEINT? CAST the oracle expression to BIGINT)")
            continue
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            a = pd.to_numeric(a, errors="coerce").astype(float)
            b = pd.to_numeric(b, errors="coerce").astype(float)
            both_nan = a.isna() & b.isna()
            exact = (a == b) | both_nan
            if not exact.all():
                close = ((a - b).abs() <= 1e-9 * (1 + b.abs())) | both_nan
                n_bad = int((~exact).sum())
                maxd = float((a - b).abs().max())
                if close.all():
                    problems.append(f"col {c}: {n_bad} non-bit-exact floats (max diff {maxd:.3e}) — WOULD FAIL strict hash")
                else:
                    problems.append(f"col {c}: {n_bad} value mismatches (max diff {maxd:.3e})")
        else:
            eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: spark={a[i]!r} duck={b[i]!r}")
    return problems

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = normalize(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            duck_df = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_df)} rows)")
            for p in problems[:6]:
                print(f"   - {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
