#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_verify.py <outDir> <sfDir>
Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle from oracle_sql.json in DuckDB over <sfDir>/*.parquet,
sorts columns by name, and compares row counts, schemas and values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name in sorted(oracles):
    res_dir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(res_dir, "*.parquet"))
    if not files:
        fails.append((name, "no spark output")); print(f"FAIL {name}: no spark output"); continue
    try:
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        duck_df = canon(con.sql(oracles[name]).df())
    except Exception as e:
        fails.append((name, f"error: {e}")); print(f"FAIL {name}: {e}"); continue
    if list(spark_df.columns) != list(duck_df.columns):
        fails.append((name, f"cols {list(spark_df.columns)} vs {list(duck_df.columns)}"))
        print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}"); continue
    if len(spark_df) != len(duck_df):
        fails.append((name, f"rows {len(spark_df)} vs {len(duck_df)}"))
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); continue
    bad = None
    def kind_of(s):
        # Collapse dtypes into the categories the driver's hash is
        # sensitive to. An int column coming back float64 from DuckDB
        # (HUGEINT via uncast //-by-SUM) hashes differently even when
        # every value is equal — that class must FAIL here.
        k = s.dtype.kind
        if k in "iu": return "int"
        if k == "f": return "float"
        if k == "b": return "bool"
        if k == "M": return "datetime"
        if k == "O":
            for v in s:
                if v is None: continue
                import datetime
                if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                    return "date"
                return "obj"
            return "obj"
        return "obj"
    for c in spark_df.columns:
        ka, kb = kind_of(spark_df[c]), kind_of(duck_df[c])
        if ka != kb and {ka, kb} & {"int", "float", "date", "datetime"}:
            bad = f"col {c} DTYPE-PARITY {ka}({spark_df[c].dtype}) vs {kb}({duck_df[c].dtype})"
            break
    if bad:
        fails.append((name, bad)); print(f"FAIL {name}: {bad}"); continue
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            exact = (a.astype(float).fillna(1.5) == b.astype(float).fillna(1.5)).all()
            if not exact:
                bad = f"col {c} float mismatch (first diff: " + str(
                    next(((x, y) for x, y in zip(a, b) if (x != y and not (pd.isna(x) and pd.isna(y)))), None)) + ")"
                break
        else:
            eq = (a.astype(str).fillna("<null>") == b.astype(str).fillna("<null>")).all()
            if not eq:
                diffs = [(x, y) for x, y in zip(a.astype(str), b.astype(str)) if x != y][:3]
                bad = f"col {c} mismatch {diffs} (dtypes {a.dtype}/{b.dtype})"
                break
    if bad:
        fails.append((name, bad)); print(f"FAIL {name}: {bad}")
    else:
        print(f"OK   {name} ({len(spark_df)} rows)")

print(f"\n{len(oracles) - len(fails)}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
