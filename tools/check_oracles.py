"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, compare row count + column names + order-insensitive
value multiset.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            if f == int(f) and abs(f) < 1e15:
                return str(int(f))
            return f"{f:.6f}"
    except ImportError:
        pass
    return str(v)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sig_rows = sorted(
        "|".join(normalize_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in sig_rows:
        h.update(row.encode())
        h.update(b"\n")
    return sorted(cols), len(rows), h.hexdigest(), sig_rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from warctools_spark.session import get_spark

    spark = get_spark(app="oracle_check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        sc, sn, sh, srows_n = frame_signature(scols, srows)
        dc, dn, dh, drows_n = frame_signature(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            failures.append(name)
        elif sn != dn:
            print(f"FAIL  {name}: rowcount {sn} vs {dn}")
            failures.append(name)
            _show_diff(srows_n, drows_n)
        elif sh != dh:
            print(f"FAIL  {name}: value hash mismatch ({sn} rows)")
            failures.append(name)
            _show_diff(srows_n, drows_n)
        else:
            print(f"OK    {name}: {sn} rows")
    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print("all queries match")


def _show_diff(srows, drows, limit=3):
    sset, dset = set(srows), set(drows)
    for r in list(sset - dset)[:limit]:
        print(f"        spark-only : {r[:220]}")
    for r in list(dset - sset)[:limit]:
        print(f"        duckdb-only: {r[:220]}")


if __name__ == "__main__":
    main()
