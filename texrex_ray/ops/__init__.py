"""Dataset-level relational operators Ray Data lacks natively.

``join`` — distributed equi-joins (broadcast + bucketed shuffle).
"""

from texrex_ray.ops.join import broadcast_join, join, shuffle_join

__all__ = ["broadcast_join", "join", "shuffle_join"]
