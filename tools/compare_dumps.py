#!/usr/bin/env python3
"""Run-to-run determinism check: compare two full graft.Verify dumps.

Usage: python3 tools/compare_dumps.py <dumpDirA> <dumpDirB>

For every query directory present in both dumps, loads the parquet
results into DuckDB and requires zero differing rows via EXCEPT ALL in
both directions (multiset equality — duplicate rows count). A query
whose two runs differ in any cell is nondeterministic and would flake
under the driver's hash compare.
"""
import sys
from pathlib import Path

import duckdb


def main():
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    names = sorted(d.name for d in a.iterdir()
                   if d.is_dir() and (b / d.name).is_dir())
    con = duckdb.connect()
    bad = []
    for n in names:
        pa, pb = f"{a / n}/*.parquet", f"{b / n}/*.parquet"
        try:
            d1 = con.execute(
                f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pa}') "
                f"EXCEPT ALL SELECT * FROM read_parquet('{pb}'))").fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (SELECT * FROM read_parquet('{pb}') "
                f"EXCEPT ALL SELECT * FROM read_parquet('{pa}'))").fetchone()[0]
        except Exception as e:  # noqa: BLE001 — report and continue
            bad.append((n, f"error: {e}"))
            continue
        if d1 or d2:
            bad.append((n, f"{d1}+{d2} differing rows"))
        print(f"{'DIFF' if d1 or d2 else 'SAME'} {n}")
    print(f"== {len(names) - len(bad)} identical, {len(bad)} differ ==")
    for n, why in bad:
        print(f"  {n}: {why}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
