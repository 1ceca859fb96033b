#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against the
parquet tables in <sfDir> (registered by bare table name), loads the Spark
result parquet from <verifyOutDir>/<name>/, then compares: column names
(sorted), dtypes-compatible values, row counts, and exact/approx equality.

This is test tooling only — the engine itself is pure Scala/Spark.
"""
import hashlib
import json
import math
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# ---------------------------------------------------------------------
# DuckDB-result memo (VERDICT r16 next #5): oracle outputs are a
# DETERMINISTIC function of (corpus bytes, SQL text), so repeat sweeps
# over the same corpus (the per-round sf1 x10 replica, regenerated only
# when missing) can reuse them. The cache key hashes the SQL plus every
# registered table file's (relative name, size, mtime_ns) — any corpus
# regeneration or SQL edit invalidates naturally. Disable with
# GRAFT_ORACLE_CACHE=0; dir override via GRAFT_ORACLE_CACHE_DIR.
# ---------------------------------------------------------------------

def _cache_dir():
    if os.environ.get("GRAFT_ORACLE_CACHE", "1").lower() in ("0", "false", "off", "no"):
        return None
    # per-uid default + ownership check (ADVICE r17 #2): a shared
    # world-writable dir would let any local user drop a parquet file
    # the correctness gate silently trusts as ground truth. An
    # explicitly-configured dir must be owned by the caller too.
    import tempfile
    default = Path(tempfile.gettempdir()) / f"graft_oracle_cache_{os.getuid()}"
    d = Path(os.environ.get("GRAFT_ORACLE_CACHE_DIR", default))
    try:
        d.mkdir(parents=True, exist_ok=True)
        if d.stat().st_uid != os.getuid():
            return None
        return d
    except Exception:
        return None


def _corpus_fingerprint(sf_dir: str) -> str:
    h = hashlib.md5()
    root = Path(sf_dir)
    for t in TABLES:
        p = root / f"{t}.parquet"
        files = sorted(p.glob("*.parquet")) if p.is_dir() else ([p] if p.exists() else [])
        for f in files:
            st = f.stat()
            h.update(f"{t}/{f.name}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()


def _cached_duck(con, cache_dir, corpus_fp: str, name: str, sql: str) -> pd.DataFrame:
    if cache_dir is None:
        return con.execute(sql).fetchdf()
    key = hashlib.md5((corpus_fp + "\n" + sql).encode()).hexdigest()
    f = cache_dir / f"{name}_{key}.parquet"
    if f.exists():
        try:
            return pd.read_parquet(f)
        except Exception:
            pass  # unreadable cache entry: fall through and rewrite
    df = con.execute(sql).fetchdf()
    try:
        tmp = f.with_suffix(".tmp")
        df.to_parquet(tmp)
        tmp.rename(f)
    except Exception:
        pass  # cache write failure must never fail the gate
    return df


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize decimals -> float for comparison
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes,)):
            continue
        try:
            if df[c].dtype == object:
                import decimal
                if len(df) and isinstance(df[c].dropna().iloc[0], decimal.Decimal):
                    df[c] = df[c].astype(float)
        except Exception:
            pass
    # Sort by non-float columns first: a stable sort on the discrete
    # columns aligns rows without letting a last-ulp float difference
    # shuffle the pairing. But the discrete columns alone are NOT a total
    # order on every corpus — the synthetic lineitem carries duplicate
    # (l_orderkey, l_linenumber) pairs (143k at sf0.1), so rows tied on
    # every discrete column but differing in float payloads aligned
    # arbitrarily and fabricated MISMATCHes (first seen in the r10 sf1
    # sweep: q_p2/q_u2). Rounded float columns break those ties: rounding
    # to 6 significant-ish decimals is far coarser than any ulp noise, so
    # genuinely-equal values still tie (harmless) while distinct payloads
    # order identically on both sides.
    sort_cols = [c for c in df.columns
                 if not np.issubdtype(df[c].dtype, np.floating)]
    float_cols = [c for c in df.columns
                  if np.issubdtype(df[c].dtype, np.floating)]
    for c in float_cols:
        df[f"__tie_{c}"] = df[c].round(6)
    if sort_cols or float_cols:
        df = df.sort_values(
            by=sort_cols + [f"__tie_{c}" for c in float_cols],
            kind="mergesort").reset_index(drop=True)
    df = df.drop(columns=[f"__tie_{c}" for c in float_cols])
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        return [f"columns differ: spark={sc} duck={dc}"]
    if len(spark_df) != len(duck_df):
        return [f"row count differs: spark={len(spark_df)} duck={len(duck_df)}"]
    a, b = norm(spark_df), norm(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            exact = (af == bf) | both_nan
            if not exact.all():
                close = np.isclose(af, bf, rtol=1e-12, atol=1e-12) | both_nan
                n_bad = int((~exact).sum())
                worst = np.nanmax(np.abs(af - bf))
                tag = "NONEXACT" if close.all() else "MISMATCH"
                problems.append(f"{tag} col={c}: {n_bad} rows differ, worst abs diff={worst:.3e}")
        else:
            try:
                eq = (av == bv) | (av.isna() & bv.isna())
            except Exception:
                eq = av.astype(str) == bv.astype(str)
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"MISMATCH col={c}: {int((~eq).sum())} rows differ; "
                    f"first at sorted-row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional name prefixes (3rd+ args): check only matching queries —
    # lets a large-SF pass skip the recursive-CTE oracles, which DuckDB
    # executes in minutes at sf0.1
    prefixes = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():
            # scaled replicas are multi-file parquet directories
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    if prefixes:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in prefixes)}
    cache_dir = _cache_dir()
    corpus_fp = _corpus_fingerprint(sf_dir) if cache_dir is not None else ""
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pq = Path(out_dir) / name
        if not pq.exists():
            print(f"FAIL  {name}: no spark output at {pq}")
            n_bad += 1
            continue
        try:
            spark_df = pd.read_parquet(pq)
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark parquet: {e}")
            n_bad += 1
            continue
        try:
            duck_df = _cached_duck(con, cache_dir, corpus_fp, name, sql)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_bad += 1
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            print(f"FAIL  {name} ({len(spark_df)} rows)")
            for p in problems:
                print(f"      {p}")
            if name.startswith("q_v8"):
                # ADVICE r15: the q_v8 oracles encode MEASURED beam
                # exactness at the gate corpora, not a structural
                # guarantee — on a new corpus/scale triage a failure as
                # corpus-exactness (raise beam/ef, see VectorQueries
                # contract note) before suspecting the walk kernel.
                print("      note: q_v8* oracles assume measured beam "
                      "exactness at this corpus — triage as beam/ef "
                      "corpus-exactness first, not a kernel bug")
            n_bad += 1
        else:
            print(f"OK    {name} ({len(spark_df)} rows)")
            n_ok += 1
    # rows-only queries (no oracle): check output exists and has rows
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            try:
                n = len(pd.read_parquet(d))
                print(f"ROWS  {d.name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            except Exception as e:
                print(f"ROWS  {d.name}: unreadable: {e}")
    print(f"\n{n_ok} ok, {n_bad} failed of {len(oracle)} oracled queries")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
