"""tools/attention_viz.py: render dumped attention maps to a PNG."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)


def _image(tmp_path):
    from PIL import Image

    path = tmp_path / "img.jpg"
    Image.fromarray(
        (np.random.default_rng(0).random((56, 56, 3)) * 255).astype(np.uint8)
    ).save(path)
    return str(path)


def test_render_hiecoatten_maps(tmp_path):
    from attention_viz import main

    np.savez(tmp_path / "att.npz",
             av=np.random.default_rng(1).random(196).astype(np.float32),
             aq=np.asarray([0.7, 0.2, 0.1, 0.0], np.float32))
    out = tmp_path / "viz.png"
    main(["--image", _image(tmp_path),
          "--attention", str(tmp_path / "att.npz"),
          "--question", "what is this",
          "--out", str(out)])
    assert out.exists() and out.stat().st_size > 1000


def test_render_mfb_glimpse_logits(tmp_path):
    from attention_viz import main

    rng = np.random.default_rng(2)
    np.savez(tmp_path / "att.npz",
             q_att_logits=rng.random((5, 2)).astype(np.float32),
             co_att_logits=rng.random((196, 2)).astype(np.float32))
    out = tmp_path / "viz.png"
    main(["--image", _image(tmp_path),
          "--attention", str(tmp_path / "att.npz"),
          "--question", "is it a cat",
          "--out", str(out)])
    assert out.exists()


def test_long_question_truncates_to_map_length(tmp_path):
    # a question longer than the dump's T must render (truncated like the
    # model's encode), not crash the bar chart with a shape mismatch
    from attention_viz import main

    np.savez(tmp_path / "att.npz",
             av=np.ones(196, np.float32),
             aq=np.asarray([0.5, 0.5], np.float32))
    out = tmp_path / "viz.png"
    main(["--image", _image(tmp_path),
          "--attention", str(tmp_path / "att.npz"),
          "--question", "what color is the big cat on the mat",
          "--out", str(out)])
    assert out.exists()


def test_uniform_quirk_flag_labels_glimpses(tmp_path):
    from attention_viz import region_maps

    maps = {
        "co_att_logits": np.random.default_rng(3).random((196, 2)),
        "uniform_quirk": np.asarray(True),
    }
    titles = [t for t, _ in region_maps(maps)]
    assert all("POOLED UNIFORMLY" in t for t in titles)


def test_no_region_maps_is_explicit(tmp_path):
    from attention_viz import main

    np.savez(tmp_path / "att.npz", aq=np.ones(4, np.float32))
    with pytest.raises(SystemExit, match="no region attention"):
        main(["--image", _image(tmp_path),
              "--attention", str(tmp_path / "att.npz"),
              "--out", str(tmp_path / "x.png")])
