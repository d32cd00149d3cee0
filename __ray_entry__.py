"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).  Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in texrex_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship texrex cleaning chain over /root/testdata/sf0.001/documents.

    read_parquet → SecondPass → Normalizer/NFC → tokenize → quality →
    assessment (badness + language) → fingerprints (md5/rolling/minhash/
    simhash); returns the cleaned Dataset.
    """
    import ray.data

    from texrex_ray.pipelines.clean_documents import clean_documents

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    return clean_documents(ds, minhash_k=64)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from texrex_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from texrex_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
