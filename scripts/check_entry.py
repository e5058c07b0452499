"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and compare against
``oracle_sql()`` via DuckDB (row count, column names, order-insensitive
value comparison).  Usage: python scripts/check_entry.py [sf_dir]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from tegenaria_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("check-entry", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []

    df = entrymod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={[f.name for f in df.schema.fields]}")
    assert n >= 0

    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [f.name for f in sdf.schema.fields]
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            if len(srows) == 0 and name != "f1_dedup_anti_join":
                failures.append((name, "0 rows (rows-only check would be weak)"))
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        scols_l = [c.lower() for c in scols]
        if scols_l != dcols:
            failures.append((name, f"schema mismatch: spark={scols_l} duckdb={dcols}"))
            print(f"FAIL  {name}: schema mismatch {scols_l} vs {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        s_norm = normalize([r.asDict() for r in srows], scols)
        d_norm = normalize(drows, list(range(len(dcols))) if False else dcols)
        # duckdb rows are tuples; normalize handles via index
        d_norm = sorted(
            "|".join(
                str(round(v, 9)) if isinstance(v, float) else str(v) for v in row
            )
            for row in drows
        )
        if s_norm != d_norm:
            diff = [x for x, y in zip(s_norm, d_norm) if x != y][:3]
            failures.append((name, f"value mismatch, e.g. {diff}"))
            print(f"FAIL  {name}: value mismatch ({len(srows)} rows)")
            for x, y in list(zip(s_norm, d_norm))[:200]:
                if x != y:
                    print(f"      spark={x!r}\n      duck ={y!r}")
                    break
        else:
            print(f"OK    {name}: {len(srows)} rows match ({dt:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries clean")
    if failures:
        for n_, msg in failures:
            print(f"  FAIL {n_}: {msg}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
