"""End-to-end reproductions of the reference's three entry points
(intended semantics) over Book-Crossing-shaped inputs — the direct
"switch from the reference" surface. See part_a_q1, part_a_q2, part_b."""

from .part_a_q1 import batch_reports, clean_books, clean_users
from .part_a_q2 import run_collaborative_filtering
from .part_b import run_stream_counters

__all__ = [
    "batch_reports",
    "clean_books",
    "clean_users",
    "run_collaborative_filtering",
    "run_stream_counters",
]
