"""ResNet-152 feature trunk: the offline image-feature extractor.

Capability twin of the reference's ``FeaturesExtractor``
(extract_image_features.py:19-26): a pretrained ResNet-152 with avgpool+fc
dropped, fed 448x448 ImageNet-normalised images, producing a
[14, 14, 2048] -> [196, 2048] feature grid per image.

TPU-first design:
- pure function over an explicit param pytree, jit-compiled end to end,
  NHWC layout (XLA's native conv layout on TPU);
- inference-only: every batch-norm is **folded** into a per-channel
  scale+bias at weight-conversion time (one fused multiply-add instead of a
  normalisation graph);
- preprocessing (uint8 -> resize 448 -> ImageNet normalise, the counterpart
  of extract_image_features.py:55-60) is part of the jitted graph, so the
  host ships raw uint8 and HBM traffic is 4x smaller;
- weights convert from a torchvision ``resnet152`` state_dict via
  ``convert_torchvision_resnet152`` (offline; no download at runtime).

Architecture (standard ResNet v1.5 bottleneck, matching torchvision):
stem 7x7/2 + maxpool/2, then bottleneck stages [3, 8, 36, 3] with widths
[64, 128, 256, 512] x4 expansion, stride 2 at each stage entry (stride on
the 3x3, as torchvision does).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

STAGES = (3, 8, 36, 3)
WIDTHS = (64, 128, 256, 512)
EXPANSION = 4

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# functional blocks
# ---------------------------------------------------------------------------

def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    # Explicit symmetric k//2 padding — torch's Conv2d(padding=k//2)
    # semantics. XLA's "SAME" pads asymmetrically under stride 2 on even
    # inputs ((0,1) instead of (1,1)), sampling a grid shifted by one pixel;
    # that misalignment compounds through every stride-2 stage and diverged
    # 23-56% from the torch forward (caught by tests/test_torch_parity.py).
    kh, kw = int(w.shape[0]), int(w.shape[1])
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _conv_bn(x: jnp.ndarray, p: Dict, stride: int = 1) -> jnp.ndarray:
    """Conv + folded batch-norm (scale/bias precomputed at conversion)."""
    y = _conv(x, p["w"], stride)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _bottleneck(x: jnp.ndarray, p: Dict, stride: int) -> jnp.ndarray:
    out = jax.nn.relu(_conv_bn(x, p["conv1"]))
    out = jax.nn.relu(_conv_bn(out, p["conv2"], stride))  # stride on the 3x3
    out = _conv_bn(out, p["conv3"])
    shortcut = _conv_bn(x, p["downsample"], stride) if "downsample" in p else x
    return jax.nn.relu(out + shortcut)


def preprocess(images_uint8: jnp.ndarray, size: int = 448) -> jnp.ndarray:
    """[N, H, W, 3] uint8 -> resized, ImageNet-normalised float
    (extract_image_features.py:55-60)."""
    x = images_uint8.astype(jnp.float32) / 255.0
    n = x.shape[0]
    if x.shape[1:3] != (size, size):  # already host-resized: skip the no-op
        x = jax.image.resize(x, (n, size, size, 3), method="bilinear")
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def apply(params: Dict, images: jnp.ndarray,
          dtype=jnp.bfloat16) -> jnp.ndarray:
    """[N, H, W, 3] float (preprocessed) -> [N, 196, 2048] feature grid."""
    x = images.astype(dtype)
    x = jax.nn.relu(_conv_bn(x, params["stem"], stride=2))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    # stage COUNT and depth both derive from the params, so converted
    # torchvision weights (3,8,36,3) and tiny test trunks of any number of
    # stages run through the same code
    s = 0
    while f"layer{s + 1}" in params:
        for b, block in enumerate(params[f"layer{s + 1}"]):
            stride = 2 if (b == 0 and s > 0) else 1
            x = _bottleneck(x, block, stride)
        s += 1
    n, h, w, c = x.shape
    return x.reshape(n, h * w, c).astype(jnp.float32)


def extract(params: Dict, images_uint8: jnp.ndarray,
            dtype=jnp.bfloat16, size: int = 448) -> jnp.ndarray:
    """uint8 images -> feature grid, fully jittable."""
    return apply(params, preprocess(images_uint8, size), dtype)


# ---------------------------------------------------------------------------
# weight conversion / random init
# ---------------------------------------------------------------------------

def _fold_bn(gamma, beta, mean, var, eps: float = 1e-5):
    scale = gamma / np.sqrt(var + eps)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def convert_torchvision_resnet152(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torchvision ``resnet152().state_dict()`` (as numpy) -> param pytree.

    Conv weights transpose OIHW -> HWIO; each BN folds into (scale, bias).
    Works on any dict of numpy arrays with torchvision's key names, e.g.
    ``{k: v.numpy() for k, v in torch.load(path).items()}``.
    """

    def conv_bn(conv_key: str, bn_key: str) -> Dict:
        w = np.transpose(state_dict[conv_key], (2, 3, 1, 0)).astype(np.float32)
        scale, bias = _fold_bn(
            state_dict[bn_key + ".weight"],
            state_dict[bn_key + ".bias"],
            state_dict[bn_key + ".running_mean"],
            state_dict[bn_key + ".running_var"],
        )
        return {"w": w, "scale": scale, "bias": bias}

    # stage depths come from the checkpoint itself, not the STAGES
    # constant: the converter then accepts any torchvision-layout bottleneck
    # ResNet (e.g. the depth-reduced trunks tests use for 448-res runs),
    # and a truncated/corrupt resnet152 .pth still fails loudly below on
    # its first missing block key
    stages = tuple(
        1 + max((int(k.split(".")[1]) for k in state_dict
                 if k.startswith(f"layer{s + 1}.")), default=-1)
        for s in range(4)
    )
    if 0 in stages:
        raise ValueError(
            f"state_dict is missing an entire residual stage: {stages}"
        )

    params: Dict = {"stem": conv_bn("conv1.weight", "bn1")}
    for s, n_blocks in enumerate(stages):
        layer: List[Dict] = []
        for b in range(n_blocks):
            pre = f"layer{s + 1}.{b}"
            block = {
                "conv1": conv_bn(f"{pre}.conv1.weight", f"{pre}.bn1"),
                "conv2": conv_bn(f"{pre}.conv2.weight", f"{pre}.bn2"),
                "conv3": conv_bn(f"{pre}.conv3.weight", f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in state_dict:
                block["downsample"] = conv_bn(
                    f"{pre}.downsample.0.weight", f"{pre}.downsample.1"
                )
            layer.append(block)
        params[f"layer{s + 1}"] = layer
    return params


def random_init(rng: jax.Array, dtype=jnp.float32,
                stages: Tuple[int, ...] = STAGES) -> Dict:
    """He-normal random trunk with identity folded-BN — same shapes as the
    converted torchvision weights. For pipeline tests and throughput work;
    real feature extraction needs converted pretrained weights (the published
    accuracies sit on them, extract_image_features.py:22)."""

    def conv_bn(key, kh, kw, cin, cout):
        fan_in = kh * kw * cin
        w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * np.sqrt(
            2.0 / fan_in
        )
        return {
            "w": w,
            "scale": jnp.ones((cout,), dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    keys = jax.random.split(rng, 256)
    ki = iter(range(256))
    params: Dict = {"stem": conv_bn(keys[next(ki)], 7, 7, 3, 64)}
    cin = 64
    for s, n_blocks in enumerate(stages):
        width = WIDTHS[s]
        cout = width * EXPANSION
        layer = []
        for b in range(n_blocks):
            block = {
                "conv1": conv_bn(keys[next(ki)], 1, 1, cin, width),
                "conv2": conv_bn(keys[next(ki)], 3, 3, width, width),
                "conv3": conv_bn(keys[next(ki)], 1, 1, width, cout),
            }
            if b == 0:
                block["downsample"] = conv_bn(keys[next(ki)], 1, 1, cin, cout)
            layer.append(block)
            cin = cout
        params[f"layer{s + 1}"] = layer
    return params
