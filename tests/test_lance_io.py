"""Lance-gated image-table I/O: schema fidelity + fallback behavior."""

import os

import pyarrow as pa
import ray.data

from texrex_ray.sources.images import make_images
from texrex_ray.sources.lance_io import (
    INPUT_HINT_SCHEMA,
    have_lance,
    read_images,
    table_format,
    write_images,
)


def test_fixture_matches_input_hint_schema():
    images, _ = make_images(n=20, seed=42)
    got = {f.name: f.type for f in images.schema}
    for field in INPUT_HINT_SCHEMA:
        assert got[field.name] == field.type, field.name


def test_write_read_roundtrip_table(tmp_path, ray_session):
    images, _ = make_images(n=30, seed=7)
    d = str(tmp_path / "imgs")
    fmt = write_images(images, d)
    assert fmt == ("lance" if have_lance() else "parquet")
    assert table_format(d) == fmt
    back = read_images(d).to_pandas().sort_values("image_id").reset_index(drop=True)
    orig = images.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert back["image_id"].tolist() == orig["image_id"].tolist()
    assert back["phash"].tolist() == orig["phash"].tolist()
    assert [bytes(b) for b in back["bytes"]] == [bytes(b) for b in orig["bytes"]]


def test_write_read_roundtrip_dataset(tmp_path, ray_session):
    images, _ = make_images(n=25, seed=3)
    ds = ray.data.from_arrow(images)
    d = str(tmp_path / "imgs_ds")
    write_images(ds, d)
    back = read_images(d, columns=["image_id", "caption"])
    df = back.to_pandas()
    assert sorted(df.columns) == ["caption", "image_id"]
    assert len(df) == 25


def test_format_marker_survives(tmp_path):
    images, _ = make_images(n=5, seed=1)
    d = str(tmp_path / "m")
    write_images(images, d, fmt="parquet")
    assert table_format(d) == "parquet"
    assert os.path.exists(os.path.join(d, "_FORMAT"))
