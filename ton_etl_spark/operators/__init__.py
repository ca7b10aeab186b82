"""Gold-layer / datamart operators (SURVEY.md §2.6–2.10) plus the
large-scale training-data-pipeline operators (dedup, similarity, text
analysis, multimodal plumbing).

All operators are pure DataFrame -> DataFrame functions: declarative
plans Catalyst can optimize, no driver-side loops, Python only inside
Arrow-vectorized UDFs where built-ins genuinely can't express the
semantics.
"""

from .snapshot import latest_state
from .asof import asof_join
from .decayed import time_decayed_avg
from .trace_match import chain_signature
from .setops import exclude_rows, except_dedup
from .components import canonical_docs, connected_components, near_dup_clusters

__all__ = [
    "latest_state",
    "asof_join",
    "time_decayed_avg",
    "chain_signature",
    "exclude_rows",
    "except_dedup",
    "connected_components",
    "near_dup_clusters",
    "canonical_docs",
]
