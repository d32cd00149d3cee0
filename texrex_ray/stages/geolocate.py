"""Geolocator: IP → (country, region, city) via binary search on interval
blocks.

Semantics follow the reference (ref: trgeolocator.pas:116-173): GeoLite-style
blocks (ip_from, ip_to, location_id) + a locations table (location_id →
country, region, city) loaded once into a shared table, lookups by binary
search over the interval starts.  Here the block/location tables are
broadcast via ``ray.put`` and each batch does one vectorized
``np.searchsorted`` — the as-of/range-join pattern (SURVEY.md §2.7).

Block data is synthetic (the reference's MaxMind data is external); the
generator emits deterministic non-overlapping IPv4 ranges with a
location id per block resolving to (country, region, city).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from texrex_ray.functions.urlkit import ip_to_int


def synthetic_geo_blocks(n_blocks: int = 64, seed: int = 42):
    """(starts: uint64[], ends: uint64[], locations) where locations is a
    list of (country, region, city) per block — the reference's two-table
    blocks→locations layout collapsed to one resolved row per block."""
    rng = np.random.default_rng(seed)
    bounds = np.empty(0, dtype=np.uint64)
    while len(bounds) < 2 * n_blocks:
        cand = rng.integers(1, 2**32 - 1, size=4 * n_blocks, dtype=np.uint64)
        bounds = np.unique(np.concatenate([bounds, cand]))
    bounds = np.sort(bounds[: 2 * n_blocks])
    starts = bounds[0::2].astype(np.uint64)
    ends = bounds[1::2].astype(np.uint64)
    locations = [
        (f"C{i % 12:02d}", f"R{i % 5}", f"city{i:03d}") for i in range(n_blocks)
    ]
    return starts, ends, locations


class Geolocator:
    """Actor-pool stage: adds ``country``/``region``/``city`` from ``ip``.

    Accepts either the resolved (country, region, city) tuples of
    ``synthetic_geo_blocks`` or a bare country list (legacy callers);
    bare countries resolve with empty region/city.
    """

    def __init__(self, starts: np.ndarray, ends: np.ndarray, locations: list):
        self.starts = np.asarray(starts, dtype=np.uint64)
        self.ends = np.asarray(ends, dtype=np.uint64)
        self.locations = [
            loc if isinstance(loc, tuple) else (loc, "", "") for loc in locations
        ]

    def lookup_ints(self, ips: np.ndarray) -> list[tuple[str, str, str]]:
        idx = np.searchsorted(self.starts, ips, side="right") - 1
        out = []
        for ip, i in zip(ips.tolist(), idx.tolist()):
            if i >= 0 and ip <= int(self.ends[i]):
                out.append(self.locations[i])
            else:
                out.append(("", "", ""))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ips = np.array(
            [ip_to_int(s or "") for s in batch["ip"].to_pylist()], dtype=np.uint64
        )
        locs = self.lookup_ints(ips)
        return (
            batch.append_column("country", pa.array([l[0] for l in locs], pa.string()))
            .append_column("region", pa.array([l[1] for l in locs], pa.string()))
            .append_column("city", pa.array([l[2] for l in locs], pa.string()))
        )
