"""kg — a from-scratch PySpark-native knowledge-graph construction engine.

Pipeline: ingest/normalize -> extract -> link -> canonicalize -> materialize,
over an interleaved text+media document table
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``.

Derived behaviorally from the public reference
``akhildhiman7/Distributed-Semantic-Search`` (see SURVEY.md); architecture is
Spark-first (DataFrame/Catalyst, Arrow-vectorized UDFs) — not a port.
"""

__version__ = "0.1.0"
