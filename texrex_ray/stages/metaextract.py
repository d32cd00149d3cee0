"""MetaExtractor: title / keywords / author / description / robots from the
raw HTML head.

Semantics follow the reference (ref: trmetaextractor.pas:101-108,135-179):
regex pulls from the raw header region, lower-cased keys, last-write-wins.
Stateless ``map_batches`` stage.
"""

from __future__ import annotations

import re

import pyarrow as pa

TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
META_RE = re.compile(
    r"""<meta\s+[^>]*name\s*=\s*["']?(keywords|author|description|robots)["']?"""
    r"""[^>]*content\s*=\s*["']([^"']*)["']""",
    re.IGNORECASE | re.DOTALL,
)
WS_RE = re.compile(r"\s+")


def extract_meta(head: str) -> dict[str, str]:
    out: dict[str, str] = {}
    m = TITLE_RE.search(head)
    if m:
        out["title"] = WS_RE.sub(" ", m.group(1)).strip()
    for m in META_RE.finditer(head):
        out[m.group(1).lower()] = WS_RE.sub(" ", m.group(2)).strip()
    return out


def meta_extract(batch: pa.Table, head_col: str = "head") -> pa.Table:
    heads = batch[head_col].to_pylist()
    metas = [extract_meta(h or "") for h in heads]
    for key in ("title", "keywords", "author", "description", "robots"):
        col = [m.get(key, "") for m in metas]
        name = f"meta_{key}"
        if name in batch.column_names:
            batch = batch.set_column(
                batch.schema.get_field_index(name), name, pa.array(col, pa.string())
            )
        else:
            batch = batch.append_column(name, pa.array(col, pa.string()))
    return batch
