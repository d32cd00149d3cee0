"""texrex_ray — a Ray-Data-native web-corpus construction engine.

A from-scratch rebuild of the semantics of rsling/texrex (FreePascal,
reference at /root/reference) on top of ``ray.data.Dataset``:

- the texrex cleaning chain (HTML stripping, charset conversion, entity
  cleansing, UTF-8 validation, normalization, NFC, tokenization, text
  quality assessment, boilerplate scoring, min-hash shingling, in-doc
  paragraph dedup, geolocation) as ``map_batches`` stages;
- the tender/tecl near-duplicate pipeline (shingle sort/groupby → pair
  counting → blacklist anti-join);
- the ClaraX crawler (random-walk policy, per-host politeness + robots,
  scaling-Bloom URL-seen set) as a partitioned frontier engine whose
  single-walker projection reproduces the reference's visit order;
- training-data operators beyond the reference: MinHash-LSH / SimHash /
  n-gram-Jaccard / embedding-cosine dedup, duplicate-cluster connected
  components, brute-force + LSH-ANN + IVF-ANN search, language ID,
  quality scoring, token counting, document fingerprinting, sliding /
  tumbling / session windows, grouped top-k;
- multimodal payload paths per the driver input_hint: image+caption
  (Lance-gated tables, synthetic codec, PSNR≥40), audio (SNR≥40) and
  video frame-sampling — decode / feature-extract as actor-pool stages;
- a texcomm-style control surface on the crawl engine (status, peek,
  walker add/remove, live reconfigure);
- dataset-level relational operators Ray Data lacks (``texrex_ray.ops``):
  broadcast + bucketed-shuffle equi-joins (all six types, hot-key
  salting, Bloom prefilter, plan-selecting ``join()``), range/as-of
  joins, high-cardinality ``bucketed_groupby``, grouped top-k, hop and
  session windows, deterministic global training-order shuffle with
  exact positions, integer-exact PageRank;
- corpus-release operators: PII scrub, Gopher repetition gates,
  cross-document segment dedup, canonical survivor election, and a
  persisted corpus hash index for incremental (near-)dedup of new
  shards against the historical corpus without reshuffling it.

Quick start (Ray already initialised)::

    import ray.data
    from texrex_ray.pipelines.clean_documents import clean_documents
    from texrex_ray.dedup.tender import tender
    from texrex_ray.crawl.engine import CrawlEngine

    docs = ray.data.read_parquet("documents.parquet")
    cleaned = clean_documents(docs, minhash_k=64)     # lazy Dataset
    near_dups = tender(docs)                          # (id_small, id_big, n_shared)

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by bench.py, CLI entry points and the pytest fixture.
"""

__version__ = "0.1.0"


def _filter_known_cosmetic_ray_warnings() -> None:
    """Drop exactly two known-benign Ray Data log lines, nothing else.

    - "Failed to hash the schemas (for deduplication)": pa.Schema with
      key-value metadata is unhashable (metadata dict), and the driver's
      testdata parquet carries ``pandas`` metadata — Ray's schema-dedup
      fast path then warns on EVERY block concat and falls through to the
      correct slow path (ray/data/_internal/arrow_ops/transform_pyarrow.py).
    - "Operator produced a RefBundle with a different schema": all-to-all
      ops emit schema-less empty bundles even for trivial groupbys (
      reproduced with a 100-row from_items groupby); harmless.

    Installed at package import so worker processes (which import this
    package when deserializing our stage callables) filter too.  A
    message-substring filter, NOT a logger-level change — any other
    warning from these modules still surfaces.
    """
    import logging

    class _Drop(logging.Filter):
        _noise = (
            "Failed to hash the schemas (for deduplication)",
            "Operator produced a RefBundle with a different schema",
        )

        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not any(s in msg for s in self._noise)

    for name in (
        "ray.data._internal.arrow_ops.transform_pyarrow",
        "ray.data._internal.execution.streaming_executor_state",
    ):
        logging.getLogger(name).addFilter(_Drop())


_filter_known_cosmetic_ray_warnings()
