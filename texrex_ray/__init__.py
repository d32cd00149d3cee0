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
  n-gram-Jaccard / embedding-cosine dedup, brute-force + LSH ANN search,
  language ID, quality scoring, token counting, document fingerprinting;
- an image+caption payload path (synthetic codec; decode / resize /
  feature-extract as actor-pool stages) per the driver input_hint.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by bench.py, CLI entry points and the pytest fixture.
"""

__version__ = "0.1.0"
