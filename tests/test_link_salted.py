"""Salted linking variant: result-identical to the broadcast path."""

from kg.extract import extract_triples
from kg.link import alias_dict, link_triples, link_triples_salted
from kg.normalize import normalize_spans
from kg.synth import load_interleaved
from tests.conftest import SF_DIR


def test_salted_linking_equals_broadcast(spark):
    tri = extract_triples(normalize_spans(load_interleaved(spark, SF_DIR)))
    aliases = alias_dict(spark)
    a = link_triples(tri, aliases)
    b = link_triples_salted(tri, aliases, n_salts=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
