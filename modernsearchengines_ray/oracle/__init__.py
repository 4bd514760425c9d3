"""Sequential pure-Python oracle replicating the reference's logical path."""

from .ref_oracle import (  # noqa: F401
    OracleIndex,
    build_oracle_index,
    oracle_query_processing,
    oracle_rank,
    oracle_search,
)
