#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sf parquet tables as
views in DuckDB, runs each oracle SQL, and compares against the Spark
result parquet at <verifyOutDir>/<name>/ — exact value compare with
columns sorted by name and rows sorted.

Fidelity note (r7 regression): results are fetched through `.df()`
(DuckDB -> pandas), the SAME path the driver's hash compare uses, NOT
`fetchall()`. The two differ on dtype edges: `fetchall()` hands HUGEINT
back as exact Python ints while `.df()` renders it float64, so an
oracle that leaves a HUGEINT/DECIMAL output column uncast passes a
fetchall compare but fails the driver. We additionally hard-fail any
oracle whose result schema contains HUGEINT or DECIMAL output columns —
oracles must cast to BIGINT/DOUBLE explicitly.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


BANNED_TYPES = ("HUGEINT", "DECIMAL")

# The driver sorts result frames with pandas sort_values, which raises
# "unhashable type: numpy.ndarray" on any list/struct/map cell (the r13
# q_label_centroids failure: local tuple-sort passed what the driver
# could not even load). The local gate must be at least as strict:
# nested output columns are driver-unsafe on EITHER side of the compare.
NESTED_MARKERS = ("[]", "LIST", "STRUCT", "MAP")


def nested_cols(rel):
    return [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
            if any(m in str(t).upper() for m in NESTED_MARKERS)]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        # BIT-exact, like the driver's value hash: round(v, 9) hid two
        # real divergence classes — the r12 q_embed_covariance failure
        # was a -0.0 vs +0.0 sign bit (round() preserves it but Python's
        # == treats them equal), and sub-1e-9 ULP drift passes a rounded
        # compare while failing the driver. Hex of the raw IEEE bits
        # distinguishes both.
        import struct
        return struct.pack("<d", v).hex()
    if hasattr(v, "isoformat"):          # datetime/date (incl. pandas Timestamp)
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    # pandas hands back numpy scalars; collapse to Python int/float so the
    # compare keys on value+kind exactly like the driver's value hash
    if hasattr(v, "item"):
        return norm_cell(v.item())
    return v


def fetch_df(cursor):
    """Fetch via pandas — the driver's dtype-sensitive path."""
    df = cursor.df()
    cols = list(df.columns)
    rows = [tuple(None if (x is None or (isinstance(x, float) and x != x))
                  else x for x in rec)
            for rec in df.itertuples(index=False, name=None)]
    return cols, rows


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            rel = con.sql(sql)
            # cursor.description only reports generic 'NUMBER'; the relation
            # API exposes real DuckDB logical types for the dtype gate
            bad_t = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
                     if any(b in str(t).upper() for b in BANNED_TYPES)]
            if bad_t:
                print(f"FAIL {name}: oracle output has driver-unsafe types "
                      f"{bad_t} — CAST to BIGINT/DOUBLE in the oracle SQL")
                n_fail += 1; continue
            bad_n = nested_cols(rel)
            if bad_n:
                print(f"FAIL {name}: oracle output has nested types {bad_n} "
                      f"— the driver's pandas sort cannot order them; "
                      f"emit scalar rows instead")
                n_fail += 1; continue
            ocols, orows = fetch_df(rel)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        s = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        bad_sn = nested_cols(s)
        if bad_sn:
            print(f"FAIL {name}: spark output has nested types {bad_sn} "
                  f"— the driver's pandas sort cannot order them; "
                  f"emit scalar rows instead")
            n_fail += 1; continue
        scols, srows = fetch_df(s)
        oc, orr = canon(ocols, orows)
        sc, srr = canon(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: cols spark={sc} oracle={oc}"); n_fail += 1; continue
        if len(orr) != len(srr):
            print(f"FAIL {name}: rows spark={len(srr)} oracle={len(orr)}"); n_fail += 1; continue
        bad = next((i for i, (a, b) in enumerate(zip(srr, orr)) if a != b), None)
        if bad is not None:
            print(f"FAIL {name}: first diff at sorted row {bad}:\n  spark ={srr[bad]}\n  oracle={orr[bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(srr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
