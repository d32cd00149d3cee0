"""Dataset-level relational operators Ray Data lacks natively.

``join`` — distributed equi-joins (broadcast + bucketed shuffle).
``interval`` — range / as-of joins (broadcast-searchsorted).
``aggregate`` — high-cardinality grouped aggregation (bucketed combine).
``topk`` — distributed grouped top-k (two-level combiner).
``window`` — hop windows + gap-based session windows.
``shuffle`` — deterministic global training-order shuffle with positions.
``graph`` — integer-exact PageRank over an edge Dataset.
"""

from texrex_ray.ops.aggregate import bucketed_groupby
from texrex_ray.ops.graph import pagerank_int
from texrex_ray.ops.interval import asof_join, range_join
from texrex_ray.ops.join import broadcast_join, join, shuffle_join
from texrex_ray.ops.shuffle import deterministic_shuffle
from texrex_ray.ops.topk import grouped_topk
from texrex_ray.ops.window import hop_window, session_count

__all__ = [
    "asof_join",
    "broadcast_join",
    "bucketed_groupby",
    "deterministic_shuffle",
    "grouped_topk",
    "hop_window",
    "join",
    "pagerank_int",
    "range_join",
    "session_count",
    "shuffle_join",
]
