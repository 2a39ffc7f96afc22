"""VGG-19 convolutional trunk with feature taps.

Capability twin of the predict CLI's extractor, which taps torchvision
``vgg19.features`` at module indices {27, 36} (predict_pytorch.py:34-37) —
i.e. pool4 (14x14x512 at 224 input, the grid the reference flattens to
[1, 196, 512], predict_pytorch.py:48-50) and pool5 (7x7x512) — and of the
legacy fc7 path (predict.py:14-94 used VGG16 fc7).

Functional, NHWC, jit-compiled; weights convert from torchvision
``vgg19().state_dict()`` via ``convert_torchvision_vgg19``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg19.features layout: index -> (kind, channels)
# 'C' = conv3x3+ReLU pair occupies (conv at i, relu at i+1); 'M' = maxpool.
VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

# The torchvision module indices the reference taps (predict_pytorch.py:35).
DEFAULT_TAPS = (27, 36)


def _module_index_map() -> List[Tuple[str, int]]:
    """Reconstruct torchvision's Sequential indices: conv,relu pairs and
    pools. Returns [(kind, conv_ordinal_or_-1)] indexed by module index."""
    modules: List[Tuple[str, int]] = []
    conv_i = 0
    for item in VGG19_CFG:
        if item == "M":
            modules.append(("pool", -1))
        else:
            modules.append(("conv", conv_i))
            modules.append(("relu", conv_i))
            conv_i += 1
    return modules


def apply(
    params: Dict,
    images: jnp.ndarray,  # [N, H, W, 3] preprocessed float
    taps: Sequence[int] = DEFAULT_TAPS,
    dtype=jnp.bfloat16,
) -> List[jnp.ndarray]:
    """Run the conv trunk, returning activations at the tapped torchvision
    module indices (in ascending order)."""
    modules = _module_index_map()
    max_tap = max(taps)
    x = images.astype(dtype)
    outs = []
    for idx, (kind, conv_i) in enumerate(modules):
        if kind == "conv":
            w = params["convs"][conv_i]
            x = jax.lax.conv_general_dilated(
                x, w["w"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dtype,
            ) + w["b"].astype(dtype)
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 2, 2, 1),
                window_strides=(1, 2, 2, 1),
                padding="VALID",
            )
        if idx in taps:
            outs.append(x.astype(jnp.float32))
        if idx >= max_tap:
            break
    return outs


def grid_features(params: Dict, images: jnp.ndarray,
                  tap: int = 27, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[N, H, W, 3] -> [N, L, C] flattened grid at one tap — the shape the
    predict path feeds the models (predict_pytorch.py:48-50)."""
    (feat,) = apply(params, images, taps=(tap,), dtype=dtype)
    n, h, w, c = feat.shape
    return feat.reshape(n, h * w, c)


def convert_torchvision_vgg19(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torchvision ``vgg19().state_dict()`` (as numpy) -> param pytree.

    Convs are collected by scanning the key set for ``features.<i>.weight``
    in index order — torchvision's Sequential indices are sparse (ReLU and
    pool modules hold no params), so an index walk with a fixed lookahead
    misses convs after a relu+pool gap."""
    conv_indices = sorted(
        int(k.split(".")[1])
        for k in state_dict
        if k.startswith("features.") and k.endswith(".weight")
    )
    convs = [
        {
            "w": np.transpose(
                state_dict[f"features.{i}.weight"], (2, 3, 1, 0)
            ).astype(np.float32),
            "b": state_dict[f"features.{i}.bias"].astype(np.float32),
        }
        for i in conv_indices
    ]
    expected = sum(1 for item in VGG19_CFG if item != "M")
    assert len(convs) == expected, (
        f"vgg19 state_dict has {len(convs)} convs, expected {expected}"
    )
    return {"convs": convs}


def random_init(rng: jax.Array, dtype=jnp.float32) -> Dict:
    """Random trunk with torchvision-matching shapes (tests/pipeline)."""
    convs = []
    cin = 3
    keys = jax.random.split(rng, 16)
    k = 0
    for item in VGG19_CFG:
        if item == "M":
            continue
        cout = item
        fan_in = 9 * cin
        convs.append({
            "w": jax.random.normal(keys[k], (3, 3, cin, cout), dtype)
            * np.sqrt(2.0 / fan_in),
            "b": jnp.zeros((cout,), dtype),
        })
        cin = cout
        k += 1
    return {"convs": convs}
