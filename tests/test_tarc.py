"""TARC writer + arcxi round-trip (ref: trwritetools.pas:313-369,
src/programs/arcxi.pas:30-148) — the round-2 VERDICT's only unverified
§2 component."""

import gzip
import os

import numpy as np
import pyarrow as pa
import ray.data


def _docs():
    rows = []
    for i in range(23):
        if i % 7 == 3:
            # no '<' anywhere -> the reference's 'dumped' branch
            rows.append((i, f"plain text doc {i} with   spaces but no markup"))
        else:
            rows.append(
                (
                    i,
                    f"HTTP/1.1 200 OK  Content-Type:  text/html; doc {i} \n"
                    f"<html><body>döc {i} — ünïcode &amp; more</body></html>",
                )
            )
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "raw": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_tarc_split_matches_reference_semantics():
    from texrex_ray.sources.writers import tarc_split

    h, b = tarc_split("a  b   c \n<x>y</x>")
    assert h == "a b c"  # DelSpace1 collapse + <=#32 trim
    assert b == "<x>y</x>"
    assert tarc_split("no markup at all") == (None, None)
    # '<' at position 0: empty header
    assert tarc_split("<x>") == ("", "<x>")


def test_tarc_write_roundtrip_and_offsets(ray_session, tmp_path):
    from texrex_ray.sources.writers import TARC_MARKER, arcxi, tarc_split, write_tarc

    out = str(tmp_path / "tarc")
    docs = _docs()
    manifest = (
        write_tarc(docs, out, docs_per_shard=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(manifest) == 23
    assert manifest["tarc_shard"].nunique() == 5

    raws = {r["doc_id"]: r["raw"] for r in docs.take_all()}
    for _, row in manifest.iterrows():
        raw = raws[row["doc_id"]]
        h, b = tarc_split(raw)
        if h is None:
            assert row["tarcfile"] == "dumped"
            assert (
                row["hoff"] == -1
                and row["hlen"] == -1
                and row["boff"] == -1
                and row["blen"] == -1
            )
            continue
        path = row["tarcfile"]
        # marker sits immediately before the header
        assert (
            arcxi(path, row["hoff"] - len(TARC_MARKER), len(TARC_MARKER))
            == TARC_MARKER
        )
        got_h = arcxi(path, row["hoff"], max(row["hlen"], 1)) if row["hlen"] else b""
        if row["hlen"]:
            assert got_h == h.encode("utf-8")
        got_b = arcxi(path, row["boff"], row["blen"])
        assert got_b == b.encode("utf-8") + b"\n"
        # reconstruction: header + body carry every byte after the split
        assert got_b[:-1].decode("utf-8") == raw[raw.find("<"):]

    # shard files are sized exactly as the manifest's record arithmetic says
    for shard, g in manifest.groupby("tarc_shard"):
        path = next(p for p in g["tarcfile"] if p != "dumped")
        rec = np.where(g["hlen"] < 0, 9, 9 + g["hlen"] + g["blen"])
        assert os.path.getsize(path) == rec.sum()


def test_arcxi_gzip_transparent(ray_session, tmp_path):
    from texrex_ray.sources.writers import arcxi, tarc_split, write_tarc

    out = str(tmp_path / "tarc")
    manifest = write_tarc(_docs(), out, docs_per_shard=50).to_pandas()
    row = manifest[manifest["hlen"] > 0].iloc[0]
    plain = arcxi(row["tarcfile"], row["boff"], row["blen"])
    gz = row["tarcfile"] + ".gz"
    with open(row["tarcfile"], "rb") as f, gzip.open(gz, "wb") as z:
        z.write(f.read())
    assert arcxi(gz, row["boff"], row["blen"]) == plain


def test_tarc_manifest_matches_writer(ray_session, tmp_path):
    """tarc_manifest without out_dir (the q23 path) must agree with the
    physical writer's manifest on every offset."""
    from texrex_ray.sources.writers import tarc_manifest, write_tarc

    cols = ["doc_id", "tarc_shard", "hoff", "hlen", "boff", "blen"]
    a = (
        tarc_manifest(_docs(), docs_per_shard=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[cols]
    )
    b = (
        write_tarc(_docs(), str(tmp_path / "t"), docs_per_shard=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[cols]
    )
    assert a.equals(b)
