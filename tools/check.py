#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query_prefix]

Reads each <outDir>/<name> parquet dump written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB (views registered
over the same sf parquet tables), and compares: columns sorted by name,
rows sorted, exact value equality (with float ulp report on mismatch).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    prefix = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    # engine-version forensics (VERDICT r12 ask #4): record the oracle
    # engine's version beside graft.Verify's spark/java/scala record so
    # a driver-vs-local hash divergence is adjudicable from artifacts
    art = Path(str(out_dir).rstrip("/") + "_artifacts")
    try:
        art.mkdir(parents=True, exist_ok=True)
        vf = art / "engine_versions.json"
        rec = json.loads(vf.read_text()) if vf.exists() else {}
        rec["duckdb"] = duckdb.__version__
        rec["python"] = sys.version.split()[0]
        vf.write_text(json.dumps(rec))
    except Exception as e:
        print(f"(engine_versions.json not written: {e})", file=sys.stderr)

    results = {}
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir() or not d.name.startswith(prefix):
            continue
        name = d.name
        try:
            rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
            got_cols, got = canon(rel.fetchall(), rel.columns)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        # bridge-safety audit (VERDICT r14: the driver's pandas result
        # bridge cannot hash ARRAY columns, and DECIMAL-from-double
        # columns hash-drifted four entries) — the catalog discipline is
        # scalars only in hashed rows: decimals/arrays/structs/maps must
        # be serialized or integer-scaled BEFORE the dump
        risky = [
            f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
            if "DECIMAL" in t or "[]" in t or "STRUCT" in t or "MAP" in t
        ]
        if risky:
            results[name] = f"BRIDGE-RISK {', '.join(risky)}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(got)} rows)" + (" EMPTY!" if not got else "")
            continue
        try:
            orel = con.sql(oracles[name])
            want_cols, want = canon(orel.fetchall(), orel.columns)
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e)[:200]}"
            continue
        if got_cols != want_cols:
            results[name] = f"SCHEMA-MISMATCH spark={got_cols} duck={want_cols}"
        elif len(got) != len(want):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(got)} duck={len(want)}"
        elif got != want:
            diffs = [(i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w]
            results[name] = f"VALUE-MISMATCH {len(diffs)}/{len(got)} rows; first: {diffs[0] if diffs else '?'}"
        else:
            results[name] = f"OK ({len(got)} rows)"

    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
    for k in sorted(results):
        flag = "  " if results[k].startswith(("OK", "rows-only")) else "XX"
        print(f"{flag} {k}: {results[k][:300]}")
    print(f"\n{n_ok}/{len(results)} green")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
