"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query at sf0.01 against its DuckDB oracle and compare
row count + schema + order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_family(t: str) -> str:
    """Collapse a Spark or DuckDB dtype string to the family the driver's
    value hash distinguishes.  HUGEINT and DECIMAL are deliberately NOT
    merged into int/float: DuckDB window/plain sum(BIGINT) yields HUGEINT
    and sum(DOUBLE-ish DECIMAL) yields DECIMAL, and both hash differently
    from Spark's long/double even at equal values (the r2 doc_budget_slice
    red row).  Oracles must CAST them."""
    t = t.lower().strip()
    if t.startswith("decimal"):
        return "decimal"
    if t in ("hugeint", "int128", "uhugeint"):
        return "hugeint"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long",
             "short", "byte", "utinyint", "usmallint", "uinteger",
             "ubigint"):
        return "int"
    if t in ("float", "double", "real", "float4", "float8"):
        return "float"
    if t in ("varchar", "string", "text", "char"):
        return "str"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith(("array", "list", "struct", "map",
                     "row(")) or "[]" in t:
        return "nested"
    if "timestamp" in t:
        return "timestamp"
    if t == "date":
        return "date"
    return t


def dtype_mismatches(scols, sdtypes, ocols, odtypes):
    """Return [(col, spark_family, duckdb_family)] for columns whose dtype
    families differ (matched by lowercase column name)."""
    sfam = {c.lower(): dtype_family(t) for c, t in zip(scols, sdtypes)}
    ofam = {c.lower(): dtype_family(t) for c, t in zip(ocols, odtypes)}
    out = []
    for c in sorted(set(sfam) & set(ofam)):
        if sfam[c] != ofam[c]:
            out.append((c, sfam[c], ofam[c]))
    return out


def norm_cell(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if v is None:
        return ""
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from ebel_spark.session import get_spark
    spark = get_spark(cores=8, app_name="contract-check")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    from ebel_spark.ops.dedup import release_pins

    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        release_pins()  # drop the previous query's pinned intermediates
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:
            failures.append(name)
            print(f"\nFAIL  {name:32s} spark error: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"\nROWS  {name:32s} rows={len(srows):6d}  ({dt:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c for c in res.columns]
            otypes = [str(t) for t in res.types]
            orows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"\nFAIL  {name:32s} duckdb error: {exc}")
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            failures.append(name)
            print(f"\nFAIL  {name:32s} schema {sorted(scols)} vs {sorted(ocols)}")
            continue
        mism = dtype_mismatches(scols, [t for _, t in sdf.dtypes],
                                ocols, otypes)
        if mism:
            failures.append(name)
            print(f"\nFAIL  {name:32s} dtype families differ: {mism}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"\nFAIL  {name:32s} rowcount {len(srows)} vs {len(orows)}")
            continue
        a = norm_rows(scols, [tuple(r) for r in srows])
        b = norm_rows(ocols, orows)
        if a != b:
            failures.append(name)
            ndiff = sum(1 for x, y in zip(a, b) if x != y)
            print(f"\nFAIL  {name:32s} values differ ({ndiff}/{len(a)} rows)")
            for x, y in list(zip(a, b))[:50]:
                if x != y:
                    print("   spark :", x)
                    print("   duckdb:", y)
                    break
        else:
            print(f"\nOK    {name:32s} rows={len(srows):6d}  ({dt:.1f}s)")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
