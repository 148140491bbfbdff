"""Operator vocabulary.

``core`` re-expresses every relational operator of the reference
(SURVEY.md §2) as composable DataFrame functions; the sibling modules add
the large-scale pipeline surface (dedup, similarity, text, sessionization,
as-of joins, multimodal plumbing) beyond reference parity.
"""

from .core import (
    date_range_filter,
    grouped_sum,
    not_null,
    project,
    right_outer_join_coalesce,
    top_k,
)

__all__ = [
    "date_range_filter",
    "grouped_sum",
    "not_null",
    "project",
    "right_outer_join_coalesce",
    "top_k",
]
