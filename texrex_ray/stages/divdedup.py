"""In-document paragraph deduplication.

Semantics follow the reference's DivDeduplicator (ref:
trdivdeduplicator.pas:148-216): per document, hash each div text (≥3
chars); a repeated paragraph gets ``dup_of = index of its first
occurrence`` (-1 = unique), which the writer emits as a ``<dup>``
backreference.  Purely row-local — a stateless ``map_batches`` stage over
the nested divs column.
"""

from __future__ import annotations

import pyarrow as pa


def div_dedup(batch: pa.Table, min_len: int = 3) -> pa.Table:
    divs_col = batch["divs"].to_pylist()
    out = []
    for divs in divs_col:
        seen: dict[str, int] = {}
        new = []
        for i, d in enumerate(divs or []):
            t = d.get("text", "")
            dup_of = -1
            if len(t) >= min_len:
                first = seen.setdefault(t, i)
                if first != i:
                    dup_of = first
            new.append({**d, "dup_of": dup_of})
        out.append(new)
    return batch.set_column(batch.schema.get_field_index("divs"), "divs", pa.array(out))
