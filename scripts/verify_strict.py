"""Strict local mirror of the driver's correctness gate at sf0.01.

Beyond tests/test_oracle_parity.py (value-tolerant, sf0.001) this compares
the Spark result and the DuckDB oracle through Arrow and flags TYPE-FAMILY
mismatches (int vs decimal vs float vs string vs date/timestamp) — the class
that produced the round-1 DECIMAL and round-2 HUGEINT hash failures even
when the Python values compared equal.

Usage: python scripts/verify_strict.py [name_substring ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from burst_db_spark.registry import all_queries
from burst_db_spark.session import get_spark

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def family(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + family(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)


def norm_rows(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    rows = []
    for i in range(n):
        row = []
        for c in cols:
            v = data[c][i]
            row.append(_norm(v))
        rows.append(tuple(row))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def _norm(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        # EXACT — the driver value-hashes str() of every cell, so the
        # local mirror must not be more tolerant than the real gate.
        # (A 6-dp round here once passed a query whose Spark decimal
        # fold silently truncated scale 10 -> 9 on precision overflow;
        # the driver hash would have caught it. rows_close() still
        # classifies near-misses as ULP warnings for diagnosis.)
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=1e-6, abs_tol=1e-6):
                    return False
            elif va != vb:
                return False
    return True


def main() -> int:
    pats = sys.argv[1:]
    specs = all_queries()
    names = [
        n for n in specs if not pats or any(p in n for p in pats)
    ]
    spark = get_spark("verify-strict")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_fail = 0
    n_warn = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.build(spark, SF_DIR)
            # toArrow keeps Spark's types exact (toPandas would widen
            # nullable ints to float64 and fake a type-family mismatch)
            sp_tbl = sdf.toArrow()
        except Exception as e:
            print(f"FAIL {name}: spark error {e!r}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({sp_tbl.num_rows} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            du_tbl = con.execute(spec.oracle).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e!r}")
            n_fail += 1
            continue

        sp_cols = sorted(c.lower() for c in sp_tbl.column_names)
        du_cols = sorted(c.lower() for c in du_tbl.column_names)
        if sp_cols != du_cols:
            print(f"FAIL {name}: columns {sp_cols} vs {du_cols}")
            n_fail += 1
            continue
        if sp_tbl.num_rows != du_tbl.num_rows:
            print(
                f"FAIL {name}: rows {sp_tbl.num_rows} vs {du_tbl.num_rows}"
            )
            n_fail += 1
            continue
        # type families, matched by lowercase column name
        sp_fam = {
            f.name.lower(): family(f.type) for f in sp_tbl.schema
        }
        du_fam = {
            f.name.lower(): family(f.type) for f in du_tbl.schema
        }
        tmis = {
            c: (sp_fam[c], du_fam[c])
            for c in sp_fam
            if sp_fam[c] != du_fam[c]
        }
        if tmis:
            print(f"WARN {name}: type-family mismatch {tmis}")
            n_warn += 1
        sn, dn = norm_rows(sp_tbl), norm_rows(du_tbl)
        if sn != dn:
            if rows_close(sn, dn):
                # numerically near but NOT bit-exact: the driver's
                # value hash WILL fail this — treat as a failure with
                # a clearer label than a value diff.
                diffs = [(x, y) for x, y in zip(sn, dn) if x != y][:3]
                print(f"FAIL {name}: ULP drift (close, not exact), "
                      f"e.g. {diffs}")
            else:
                diffs = [(x, y) for x, y in zip(sn, dn) if x != y][:3]
                print(f"FAIL {name}: values differ, e.g. {diffs}")
            n_fail += 1
            continue
        print(f"ok   {name}: {sp_tbl.num_rows} rows, {time.time()-t0:.1f}s")

    print(f"\n{len(names)} checked, {n_fail} fail, {n_warn} type-warn")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
