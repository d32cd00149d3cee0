"""Generate committed oracle-fixture parquet tables under tests/fixtures/oracle/.

Some operators are not ANSI-SQL-expressible from the raw tables (hash
families, crawl policy, profile math).  For those, the DuckDB oracle reads
a committed fixture table and performs the REST of the computation
independently in SQL (e.g. brute-force O(n²) joins over a signature table
that verify our LSH candidate generation), or compares against an
independently-implemented expected output (e.g. the sequential ClaraX
oracle in crawl/oracle.py).

Fixtures are generated from the driver's deterministic sf0.01 tables —
the scale factor the driver's correctness gate runs at — and committed;
re-run this script if the testdata generator ever changes::

    python tools/gen_oracle_fixtures.py

Ray is initialised here (script owns its session, per the driver contract).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "oracle")


def gen_simhash_signatures() -> None:
    """(doc_id, simhash as BIGINT) over sf0.01 documents — the oracle does
    the brute-force Hamming join in SQL, independently verifying the
    block-LSH candidate generation."""
    import pandas as pd

    from texrex_ray.functions.hashing import simhash64
    from texrex_ray.functions.tokenize import LATIN_TOKEN_RE

    df = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    toks = [LATIN_TOKEN_RE.findall(s.lower()) for s in df["text"]]
    grams = [[" ".join(tk[i : i + 3]) for i in range(max(0, len(tk) - 2))] for tk in toks]
    sig = simhash64(grams).astype(np.int64)  # reinterpret: DuckDB BIGINT bit ops
    t = pa.table({"doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                  "simhash": pa.array(sig)})
    pq.write_table(t, os.path.join(OUT, "simhash_sig_sf0.01.parquet"))
    print("simhash_sig_sf0.01.parquet:", t.num_rows, "rows")


def gen_crawl_visits() -> None:
    """Expected q21 visit order from the INDEPENDENT sequential ClaraX
    oracle (crawl/oracle.py) — same fixture graph/seed/steps as q21."""
    from texrex_ray.crawl.oracle import clarax_walk
    from texrex_ray.crawl.policy import CrawlConfig
    from texrex_ray.sources.webgraph import make_webgraph

    g = make_webgraph(n_hosts=10, pages_per_host_base=10, n_seeds=8, seed=42)
    res = clarax_walk(g, max_steps=150, seed=42, config=CrawlConfig())
    t = pa.table(
        {
            "seq": pa.array([r[0] for r in res.visit_order], pa.int64()),
            "url": pa.array([r[1] for r in res.visit_order], pa.string()),
            "host": pa.array([r[2] for r in res.visit_order], pa.string()),
            "action": pa.array([r[3] for r in res.visit_order], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(OUT, "crawl_visits_sf0.01.parquet"))
    print("crawl_visits_sf0.01.parquet:", t.num_rows, "rows")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    gen_simhash_signatures()
    gen_crawl_visits()


if __name__ == "__main__":
    main()
