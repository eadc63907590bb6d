"""Driver-sim: run every __spark_entry__ queries()[k] against oracle_sql()[k]
via DuckDB at the given sf dir (default sf0.001; the real driver uses 0.01).
Usage: python scripts/check_contract.py [sf_dir] [only_prefix]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from kg.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2] if len(sys.argv) > 2 else ""

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def dtype_repr_findings(
    a: pd.DataFrame, b: pd.DataFrame
) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """Representation disagreements between two value-equal frames.

    The driver's value-hash is dtype-REPRESENTATION-sensitive: an int64 4
    and a float64 4.0 hash differently even though
    ``assert_frame_equal(check_dtype=False)`` passes. Returns
    ``(clashes, warnings)`` as (column, reason) pairs over the four
    representation classes (round-3 VERDICT item 9 + round-4 item 8):

    * int-vs-float   (DuckDB HUGEINT sums -> pandas float64)     — clash
    * decimal-vs-float (pandas object holding Decimal vs float)  — clash
    * decimal-scale  (both Decimal, different exponents: a
      decimal(38,0) ``4`` vs a decimal(18,2) ``4.00`` — same value,
      different canonical string, so the hash drifts; appears now that
      exact-decimal sums are in oracles)                         — clash
    * decimal-vs-int (Decimal 4 vs int64 4)                      — clash
    * int-width      (int32 vs int64)                            — warning
      only: CORRECTNESS_r03 proves the driver hash tolerates it
      (ss_bruteforce_topk rank int32-vs-int64 was hash-green) — ints
      hash by value, not width. Surfaced so a new query author sees it.
    """
    import decimal

    def _first_decimal(s):
        if s.dtype.kind != "O":
            return None
        v = next((x for x in s if x is not None), None)
        return v if isinstance(v, decimal.Decimal) else None

    clashes: list[tuple[str, str]] = []
    warns: list[tuple[str, str]] = []
    for col in a.columns:
        ka, kb = a[col].dtype, b[col].dtype
        kinds = {ka.kind, kb.kind}
        da, db = _first_decimal(a[col]), _first_decimal(b[col])
        clash = None
        if kinds in ({"i", "f"}, {"u", "f"}):
            clash = "int-vs-float (cast the oracle, e.g. CAST(... AS BIGINT))"
        elif (da is not None and kb.kind == "f") or (
            db is not None and ka.kind == "f"
        ):
            clash = "decimal-vs-float (cast BOTH sides to double or the same decimal)"
        elif da is not None and db is not None:
            ea, eb = da.as_tuple().exponent, db.as_tuple().exponent
            if ea != eb:
                clash = (
                    f"decimal-scale (exponents {ea} vs {eb} — same value, "
                    "different canonical form; cast BOTH sides to the same "
                    "decimal(p,s))"
                )
        elif (da is not None and kb.kind in "iu") or (
            db is not None and ka.kind in "iu"
        ):
            clash = "decimal-vs-int (cast the decimal side to BIGINT or both to the same decimal)"
        elif ka.kind in "iu" and kb.kind in "iu" and ka.itemsize != kb.itemsize:
            warns.append(
                (col, f"spark={ka} duck={kb} — int-width only (driver hash tolerates)")
            )
        if clash:
            clashes.append((col, f"spark={ka} duck={kb} — driver hash would mismatch: {clash}"))
    return clashes, warns


def main() -> None:
    spark = get_spark(app="check-contract", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and not name.startswith(ONLY):
            continue
        t0 = time.time()
        try:
            a = canon(fn(spark, SF_DIR).toPandas())
        except Exception as e:
            failures.append(name)
            print(f"[{name}] SPARK ERROR: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[{name}] rows={len(a)} (no oracle — rows-only) {time.time()-t0:.1f}s")
            continue
        try:
            b = canon(con.sql(oracles[name]).df())
        except Exception as e:
            failures.append(name)
            print(f"[{name}] DUCKDB ERROR: {str(e)[:300]}")
            continue
        ok = shape_ok = a.shape == b.shape and list(a.columns) == list(b.columns)
        if not shape_ok:
            print(
                f"[{name}] SHAPE spark={a.shape}{list(a.columns)} "
                f"duck={b.shape}{list(b.columns)}"
            )
        if ok:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False)
            except AssertionError as e:
                ok = False
                print(f"[{name}] VALUES: {str(e)[:250]}")
        if ok:
            clashes, warns = dtype_repr_findings(a, b)
            for col, msg in warns:
                print(f"[{name}] DTYPE-WARN: column '{col}' {msg}")
            for col, msg in clashes:
                ok = False
                print(f"[{name}] DTYPE-REPR: column '{col}' {msg}")
        if not ok:
            failures.append(name)
            print(" spark:\n", a.head(3).to_string())
            print(" duck:\n", b.head(3).to_string())
        print(f"[{name}] {'OK' if ok else 'FAIL'} rows={len(a)} {time.time()-t0:.1f}s")

    print("FAILED:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
