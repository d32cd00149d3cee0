"""Flagship cleaning pipeline over a flat-text documents table.

The Ray-Data re-expression of the texrex worker chain (ref:
trworker.pas:422-621; trtexrex.pas:376-463 for the pool plumbing that Ray
Data's streaming executor replaces outright): a lazy Dataset pipeline of
fused ``map_batches`` stages with an actor pool for the (stateful)
assessment stage.  Reader/worker/writer pools, bounded queues and dynamic
worker management (ref: trqueues.pas, trtexrex.pas:398-413) are all
subsumed by the streaming executor + backpressure.
"""

from __future__ import annotations

import ray.data

from texrex_ray.sources.profiles import default_profiles
from texrex_ray.stages import textchain as tc


def clean_documents(
    ds: ray.data.Dataset,
    *,
    minhash_k: int = 100,
    ngram: int = 5,
    badness_threshold: float = 5.0,
    assessor_concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 4096,
    keep_tokens: bool = False,
    profiles: list[tuple[str, str]] | None = None,
) -> ray.data.Dataset:
    """Compose the full chain; input needs a ``text`` column.

    ``assessor_concurrency=None`` runs the assessor as stateless tasks with
    a driver-constructed instance (fine for tiny profiles / small runs);
    an int or (min, max) makes it an actor pool, profile parse amortized in
    ``__init__`` — use this at scale.
    """
    kw = dict(batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(tc.secondpass, **kw)
    ds = ds.map_batches(tc.normalize, **kw)
    ds = ds.map_batches(tc.tokenize_stage, **kw)
    ds = ds.map_batches(tc.quality, **kw)
    profs = profiles if profiles is not None else default_profiles()
    if assessor_concurrency is None:
        ds = ds.map_batches(tc.Assessor(profs, threshold=badness_threshold), **kw)
    else:
        ds = ds.map_batches(
            tc.Assessor,
            fn_constructor_args=(profs,),
            fn_constructor_kwargs={"threshold": badness_threshold},
            concurrency=assessor_concurrency,
            **kw,
        )
    ds = ds.map_batches(
        lambda b: tc.fingerprints(b, k=minhash_k, ngram=ngram), **kw
    )
    if not keep_tokens:
        ds = ds.map_batches(tc.drop_tokens, **kw)
    return ds
