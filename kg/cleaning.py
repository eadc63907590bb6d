"""Text-normalization kernel (reference: ``data/scripts/text_cleaner.py``).

Re-expresses the reference's ordered cleaning chain
(html -> latex -> urls -> unicode -> whitespace, ``text_cleaner.py:84-127``)
two ways with identical semantics on the supported input class:

* :func:`clean_text_col` — pure native column expressions (chained
  ``regexp_replace``/``translate``); stays inside whole-stage codegen, the
  100 TB hot path.
* :func:`clean_text_pandas` — an Arrow-vectorized pandas kernel (full
  ``html.unescape`` + NFKD), the "arbitrary Python per batch" slot the
  reference fills with ``data_processor_optimized.py:42-145``.

Order matters (the reference applies fixed order; SURVEY §2.3 T6) — both
paths apply the exact same order. A unit test asserts the two paths agree
on the fixture corpus.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# 7-char unicode punctuation map (reference analog: text_cleaner.py:32-40).
_UNICODE_SRC = "\u2018\u2019\u201c\u201d\u2013\u2014\u2026"
_UNICODE_DST = "''\"\"--."

_HTML_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "),
]

# (pattern, replacement) — applied in order. Latex: keep \cmd{arg} content,
# unwrap $math$, drop bare \cmd and stray $, break \\ and sub/superscripts.
_LATEX_STEPS = [
    (r"\\[a-zA-Z]+\{([^}]*)\}", r"$1"),
    (r"\$([^$]*)\$", r"$1"),
    (r"\\[a-zA-Z]+", ""),
    (r"\$+", ""),
    (r"\\\\", " "),
    (r"[_^]", " "),
]
_URL_STEPS = [
    (r"https?://\S+", " "),
    (r"\S+@\S+\.\S+", " "),
]


def clean_text_col(c: Column) -> Column:
    """Native-expression cleaning chain (html→latex→urls→unicode→ws→lower)."""
    # html: strip tags, decode common entities
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for src, dst in _HTML_ENTITIES:
        c = F.replace(c, F.lit(src), F.lit(dst))
    for pat, rep in _LATEX_STEPS:
        c = F.regexp_replace(c, pat, rep)
    for pat, rep in _URL_STEPS:
        c = F.regexp_replace(c, pat, rep)
    c = F.translate(c, _UNICODE_SRC, _UNICODE_DST)
    c = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return c


_PY_LATEX = [(re.compile(p), r.replace("$1", "\\1")) for p, r in _LATEX_STEPS]
_PY_URLS = [(re.compile(p), r) for p, r in _URL_STEPS]
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_UNI_TABLE = str.maketrans(_UNICODE_SRC, _UNICODE_DST)


def clean_text_pandas(s: pd.Series) -> pd.Series:
    """Arrow-batch pandas mirror of :func:`clean_text_col` (+ NFKD fold)."""
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.map(_html.unescape)
    for rx, rep in _PY_LATEX:
        s = s.str.replace(rx, rep, regex=True)
    for rx, rep in _PY_URLS:
        s = s.str.replace(rx, rep, regex=True)
    s = s.map(lambda t: t.translate(_UNI_TABLE))
    s = s.map(
        lambda t: "".join(
            ch for ch in unicodedata.normalize("NFKD", t) if not unicodedata.combining(ch)
        )
    )
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip().str.lower()
    return s


# SQL mirror for the DuckDB oracle (single-expression chain over a column
# reference). Must stay in lockstep with clean_text_col.
def sql_clean_text(expr: str) -> str:
    e = f"regexp_replace({expr}, '<[^>]+>', ' ', 'g')"
    for src, dst in _HTML_ENTITIES:
        e = f"replace({e}, '{src}', {_sql_str(dst)})"
    for pat, rep in _LATEX_STEPS:
        e = f"regexp_replace({e}, {_sql_str(pat)}, {_sql_str(rep.replace('$1', chr(92) + '1'))}, 'g')"
    for pat, rep in _URL_STEPS:
        e = f"regexp_replace({e}, {_sql_str(pat)}, {_sql_str(rep)}, 'g')"
    src_esc = _UNICODE_SRC.replace("'", "''")
    dst_esc = _UNICODE_DST.replace("'", "''")
    e = f"translate({e}, '{src_esc}', '{dst_esc}')"
    e = f"lower(trim(regexp_replace({e}, '\\s+', ' ', 'g')))"
    return e


def _sql_str(s: str) -> str:
    # DuckDB single-quoted literals are not escape sequences: backslashes
    # pass through verbatim (so Python regex source == DuckDB regex source);
    # only quotes need doubling.
    return "'" + s.replace("'", "''") + "'"
