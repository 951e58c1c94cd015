"""Byte-level evidence for the driver-hash dispute (VERDICT r3 §What's wrong #1).

For each disputed query (default: the three CORRECTNESS_r03 hash-FAILs
``multiway_join``, ``case_bucket``, ``range_join``) this dumps, at sf0.01:

- ``DIAG_r04/<query>.spark.csv`` — the Spark result, columns sorted by name,
  rows sorted, floats rendered exactly like the gate (%.6f);
- ``DIAG_r04/<query>.duck.csv``  — the DuckDB oracle result, same rendering;
- ``DIAG_r04/SUMMARY.txt``       — per-query row counts, the gate's
  order-insensitive value hash for both engines, and whether the dumped
  files are byte-identical.

The rendering IS the gate's compare (tools/check_oracles.py:25-37): columns
sorted by name, each row joined with \\x1f replaced by '|' for readability,
rows sorted lexicographically.  If the two dumped files are byte-identical,
the engines agree at the value level the driver hashes — any remaining
driver FAIL is environmental (stale artifact / pinned pre-fix checkout),
not an engine disagreement.

Usage: python tools/dump_disputed.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
DISPUTED = ["multiway_join", "case_bucket", "range_join"]
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "DIAG_r04")


def render_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    """The gate's stringification: columns sorted by name, floats %.6f."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = []
    for row in rows:
        parts = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.6f}"
            parts.append(str(v))
        lines.append("\x1f".join(parts))
    lines.sort()
    return lines


def gate_hash(lines: list[str]) -> str:
    return hashlib.sha256("\x1e".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries = sys.argv[2:] or DISPUTED

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from dpo_ocr_spark.session import get_spark

    spark = get_spark("dump_disputed")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    os.makedirs(OUT_DIR, exist_ok=True)
    qs, oracles = E.queries(), E.oracle_sql()
    summary = [f"sf_dir: {sf_dir}", ""]
    any_diff = False
    for name in queries:
        sdf = qs[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        s_lines = render_rows(scols, srows)
        o_lines = render_rows(ocols, orows)
        header = "|".join(sorted(scols))
        for suffix, lines in (("spark", s_lines), ("duck", o_lines)):
            with open(f"{OUT_DIR}/{name}.{suffix}.csv", "w") as f:
                f.write(header + "\n")
                f.write("\n".join(ln.replace("\x1f", "|") for ln in lines))
                f.write("\n")
        sh, oh = gate_hash(s_lines), gate_hash(o_lines)
        identical = s_lines == o_lines and sorted(scols) == sorted(ocols)
        any_diff |= not identical
        summary.append(
            f"{name}: spark_rows={len(srows)} oracle_rows={len(orows)} "
            f"spark_hash={sh} oracle_hash={oh} "
            f"byte_identical={identical}"
        )
    with open(f"{OUT_DIR}/SUMMARY.txt", "w") as f:
        f.write("\n".join(summary) + "\n")
    print("\n".join(summary))
    return 1 if any_diff else 0


if __name__ == "__main__":
    raise SystemExit(main())
