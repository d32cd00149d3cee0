"""Dataset-level relational operators Ray Data lacks natively.

``join`` — distributed equi-joins (broadcast + bucketed shuffle).
``interval`` — range / as-of joins (broadcast-searchsorted).
"""

from texrex_ray.ops.interval import asof_join, range_join
from texrex_ray.ops.join import broadcast_join, join, shuffle_join

__all__ = ["asof_join", "broadcast_join", "join", "range_join", "shuffle_join"]
