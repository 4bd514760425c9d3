"""SQL-parity tokenization — the oracle-checkable term pipeline.

The driver's correctness gate compares Ray pipelines against DuckDB SQL
on the same parquet.  These kernels are defined to be *exactly*
expressible in ANSI SQL (DuckDB dialect), so the engine side and the
SQL side agree token-for-token:

    tokens(text) == regexp_split_to_array(lower(text), '[^a-z0-9]+')
                    with empty strings removed

The full reference pipeline (Porter stems, stopwords, positions) is
checked separately against the vendored oracle in pytest — SQL cannot
express Porter stemming.
"""

from __future__ import annotations

import re

_SPLIT_RE = re.compile(r"[^a-z0-9]+")


def simple_tokens(text: str) -> list[str]:
    return [t for t in _SPLIT_RE.split(text.lower()) if t]
