"""Local stand-in for the driver's correctness gate: run every declared
query on Spark AND its DuckDB oracle, compare row count, schema shape, and
an order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from bricolage_spark.catalog import TESTDATA_TABLES, table_path
from bricolage_spark.queries import load_all
from bricolage_spark.session import get_spark


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by repr."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_val)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.map(repr)).reset_index(
        drop=True
    )
    return df


def _canon_val(v):
    import datetime

    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_val(x) for x in v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if v is pd.NaT:
        return None
    if isinstance(v, float) and pd.isna(v):
        return None
    return v


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = load_all()
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{table_path(sf_dir, t)}')"
        )

    n_pass = n_fail = n_weak = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            ok = len(sdf) >= 0
            print(f"weak {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            n_weak += 1
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        s, o = canon(sdf), canon(odf)
        problems = []
        if len(s) != len(o):
            problems.append(f"rows {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            problems.append(f"cols {list(s.columns)} vs {list(o.columns)}")
        elif value_hash(s) != value_hash(o):
            diff_cols = []
            for c in s.columns:
                if len(s) == len(o) and not s[c].equals(o[c]):
                    diff_cols.append(c)
            problems.append(f"hash mismatch (cols differ: {diff_cols})")
            if len(s) == len(o) and diff_cols:
                c = diff_cols[0]
                neq = s[c] != o[c]
                ex = pd.DataFrame({"spark": s[c][neq], "duck": o[c][neq]}).head(5)
                problems.append("\n" + ex.to_string())
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(s)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
