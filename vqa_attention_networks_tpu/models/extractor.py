"""Single-image backbone extraction shared by the predict CLI and the
serving /predict_image path (reference flow: predict_pytorch.py:34-44;
offline batch extraction lives in cli/extract_features.py).

ONE implementation of the image -> [196, C] stage so predict-time, serve-
time, and offline-extraction features cannot drift apart in preprocessing:
BILINEAR resize (torchvision Resize's default — PIL's default BICUBIC
would skew features away from the training/extraction distribution),
uint8 feed for the resnet trunk (which normalizes in-graph,
resnet.preprocess) and host-side ImageNet normalization for the VGG tap,
exactly as the extraction CLI does.
"""

from __future__ import annotations

import io

import jax
import numpy as np

from vqa_attention_networks_tpu.models import resnet, vgg


class GridExtractor:
    """Image bytes / PIL image -> [regions, channels] float32 feature grid.

    The trunk is jitted and (by default) compiled at construction via one
    dummy extraction, so a serving box pays the compile at startup rather
    than inside the first user request.
    """

    #: both taps produce a 14x14 grid (resnet152@448, vgg19-conv5@224)
    regions = 196

    def __init__(self, backbone: str, weights_path: "str | None" = None,
                 warmup: bool = True):
        if backbone not in ("resnet152", "vgg19"):
            raise ValueError(
                f"unknown backbone {backbone!r}: choose resnet152 (training "
                "features) or vgg19 (the reference predict script's tap, "
                "predict_pytorch.py:34-37)"
            )
        self.backbone = backbone
        self.random_weights = weights_path is None
        if backbone == "resnet152":
            self.size, self.channels = 448, 2048
            if weights_path:
                params = resnet.convert_torchvision_resnet152(
                    dict(np.load(weights_path))
                )
            else:
                params = resnet.random_init(jax.random.PRNGKey(0))
            self._fn = jax.jit(lambda a: resnet.extract(params, a))
            self._prep = lambda img: np.asarray(img, np.uint8)[None]
        else:
            self.size, self.channels = 224, 512
            if weights_path:
                params = vgg.convert_torchvision_vgg19(
                    dict(np.load(weights_path))
                )
            else:
                params = vgg.random_init(jax.random.PRNGKey(0))
            self._fn = jax.jit(lambda a: vgg.grid_features(params, a))

            def _prep_vgg(img):
                arr = np.asarray(img, np.float32)[None] / 255.0
                return (arr - resnet.IMAGENET_MEAN) / resnet.IMAGENET_STD

            self._prep = _prep_vgg
        if warmup:
            from PIL import Image

            self.from_pil(Image.new("RGB", (self.size, self.size)))

    def from_pil(self, img) -> np.ndarray:
        """PIL image -> [regions, channels] f32 grid."""
        from PIL import Image

        img = img.convert("RGB").resize(
            (self.size, self.size), Image.BILINEAR
        )
        return np.asarray(self._fn(self._prep(img)), np.float32)[0]

    def from_bytes(self, image_bytes: bytes) -> np.ndarray:
        """Encoded image bytes -> grid. Decode failures raise ValueError
        (a client error); backbone execution failures propagate unchanged
        (a server error) — callers map them to 400 vs 500 accordingly."""
        from PIL import Image

        try:
            img = Image.open(io.BytesIO(image_bytes))
            img.load()
        except Exception:
            raise ValueError("could not decode image") from None
        return self.from_pil(img)
