"""Extraction CLI end-to-end over tiny synthetic images (CPU, random trunk).

Covers the full pipeline the reference's extract_image_features.py defines:
directory listing (robust to stray files), threaded decode, pipelined
device batches, and the packed store contract the train CLI consumes.
"""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from vqa_attention_networks_tpu.cli import extract_features as ex
from vqa_attention_networks_tpu.data.feature_store import FeatureStore


def _make_images(d, ids, size=64):
    rng = np.random.default_rng(0)
    for i in ids:
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"COCO_val2014_{i:012d}.jpg")


def test_extract_cli_end_to_end(tmp_path, capsys):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    ids = [3, 7, 11, 19, 23]
    _make_images(img_dir, ids)
    # stray files must be skipped with a warning, not crash hours in
    (img_dir / "annotations.json").write_text("{}")
    (img_dir / "notes_readme.jpg.txt").write_text("x")

    ex.main([
        "--split", "val", "--image_dir", str(img_dir),
        "--output_dir", str(tmp_path), "--batch_size", "2",
        "--size", "64", "--dtype", "float32",
    ])
    out = capsys.readouterr().out
    assert "skipping 2" in out
    assert "64" in out  # the non-448 size warning fired

    store = FeatureStore(str(tmp_path / "resnet152_val"))
    assert sorted(store.row_of) == ids
    feats = store.gather(ids, dtype=np.float32)
    # 64/32 = 2x2 grid, 2048 channels
    assert feats.shape == (len(ids), 4, 2048)
    assert np.isfinite(feats).all()


def test_image_id_parsing():
    assert ex._image_id("COCO_val2014_000000000042.jpg") == 42
    assert ex._image_id("img (1).jpg") is None
