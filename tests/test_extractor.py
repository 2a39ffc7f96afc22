"""GridExtractor (models/extractor.py): the ONE image->grid implementation
shared by cli/predict.py and serving's /predict_image. Trunk numerics are
covered by tests/test_torch_parity.py; here we pin the interface contract
(shape constants, error classification, random-weight fallback flag)
without paying a full trunk compile."""

import numpy as np
import pytest

from vqa_attention_networks_tpu.models.extractor import GridExtractor


def test_unknown_backbone_rejected():
    with pytest.raises(ValueError, match="unknown backbone"):
        GridExtractor("alexnet")


def test_resnet_constants_and_decode_error_classification():
    ex = GridExtractor("resnet152", warmup=False)
    assert (ex.channels, ex.regions, ex.size) == (2048, 196, 448)
    assert ex.random_weights is True
    # undecodable bytes are a CLIENT error (ValueError -> HTTP 400);
    # raised before the trunk ever runs
    with pytest.raises(ValueError, match="could not decode image"):
        ex.from_bytes(b"not an image")


def test_vgg_constants():
    ex = GridExtractor("vgg19", warmup=False)
    assert (ex.channels, ex.regions, ex.size) == (512, 196, 224)


def test_vgg_trunk_runs_end_to_end():
    """The cheaper trunk (vgg19 @ 224) actually executes from_pil once:
    shape and dtype of the served grid contract."""
    from PIL import Image

    ex = GridExtractor("vgg19", warmup=False)
    grid = ex.from_pil(Image.new("RGB", (300, 200), (128, 64, 32)))
    assert grid.shape == (196, 512) and grid.dtype == np.float32
    assert np.isfinite(grid).all()
