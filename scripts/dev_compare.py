"""Dev harness: run each Spark stage and its DuckDB oracle side by side,
mirroring the driver's compare (sorted columns, sorted rows, exact values).
Usage: python scripts/dev_compare.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from kg import oracles  # noqa: E402
from kg.pipeline import build_edges  # noqa: E402
from kg.normalize import normalize_spans  # noqa: E402
from kg.session import get_spark  # noqa: E402
from kg.synth import load_interleaved  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def canon_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def compare(name: str, spark_df, sql: str, con) -> bool:
    a = canon_pdf(spark_df.toPandas())
    b = canon_pdf(con.sql(sql).df())
    ok = a.shape == b.shape
    if ok:
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
        except AssertionError as e:
            ok = False
            print(f"[{name}] VALUE MISMATCH: {str(e)[:500]}")
    else:
        print(f"[{name}] SHAPE MISMATCH spark={a.shape} duck={b.shape}")
    if not ok:
        print("spark head:\n", a.head(5))
        print("duck  head:\n", b.head(5))
    print(f"[{name}] {'OK' if ok else 'FAIL'} rows={len(a)}")
    return ok


def main() -> None:
    spark = get_spark(app="dev-compare", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )

    docs = load_interleaved(spark, SF_DIR)
    spans = normalize_spans(docs)
    triples_surface, canon, final = build_edges(docs, spark, extractor="sql")
    _, _, final_pd = build_edges(docs, spark, extractor="pandas")

    results = []
    # normalized spans vs the DuckDB cleaning chain over the dirty raw
    # spans (spans_sql() is the RAW oracle and differs since round 4)
    results.append(compare("spans", spans, oracles.spans_norm_sql(), con))
    results.append(
        compare("triples_surface", triples_surface, oracles.triples_surface_sql(), con)
    )
    results.append(
        compare(
            "canonical_map",
            canon.select("surface", "canonical_id", "canonical_name"),
            oracles.canonical_map_sql(),
            con,
        )
    )
    results.append(
        compare(
            "edges",
            final.select("subj_id", "pred", "obj_id", "doc_id", "offset"),
            oracles.edges_sql(),
            con,
        )
    )
    results.append(
        compare(
            "edges_pandas_extractor",
            final_pd.select("subj_id", "pred", "obj_id", "doc_id", "offset"),
            oracles.edges_sql(),
            con,
        )
    )
    print("ALL OK" if all(results) else "FAILURES PRESENT")
    spark.stop()


if __name__ == "__main__":
    main()
