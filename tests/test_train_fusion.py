"""Fused train-fusion kernel: host-side plumbing tests.

The kernel itself is TPU-only; its numerics were verified on hardware
(rate=0 forward matches the composed chain to 2.3e-5 in bf16, and all four
gradients correlate 1.000000 — see ops/pallas_train_fusion.py). These tests
cover the refactor/unfactor layout maths and the dispatch gating, which run
everywhere.
"""

import numpy as np
import jax.numpy as jnp

from vqa_attention_networks_tpu.ops.pallas_train_fusion import (
    _prep,
    _refactor,
    supported,
)


def test_refactor_roundtrip_layout():
    # channel c = o*k + j (output-major, mfb.py:100-101) -> [.., k, O_pad]
    k, o, o_pad = 5, 8, 16
    x = jnp.arange(o * k, dtype=jnp.float32)[None, :]  # [1, 40]
    x3 = _refactor(x, o, k, o_pad)
    assert x3.shape == (1, k, o_pad)
    # element (j, o_idx) must hold channel o_idx*k + j
    for j in range(k):
        for oi in range(o):
            assert float(x3[0, j, oi]) == oi * k + j
    # padding is zero
    assert float(jnp.abs(x3[0, :, o:]).max()) == 0.0


def test_prep_shapes():
    n, l, d, f, k = 4, 8, 32, 40, 5
    img = jnp.zeros((n, l, d), jnp.float32)
    w = jnp.zeros((d, f), jnp.float32)
    b = jnp.zeros((f,), jnp.float32)
    q = jnp.zeros((n, f), jnp.float32)
    w3, b3, q3, o, to, o_pad = _prep(img, w, b, q, k, nb=4, tf=1280)
    assert (o, to, o_pad) == (8, 256, 256)
    assert w3.shape == (d, k, o_pad)
    assert b3.shape == (1, k, o_pad)
    assert q3.shape == (n, k, o_pad)


def test_dispatch_gating(monkeypatch):
    # default-on for TPU, but never on the CPU test backend
    assert not supported(8, 0.1)
    # kill switches force the composed chain everywhere
    monkeypatch.setenv("VQA_DISABLE_PALLAS", "1")
    assert not supported(8, 0.1)
    monkeypatch.delenv("VQA_DISABLE_PALLAS")
    monkeypatch.setenv("VQA_COMPOSED_TRAIN_FUSION", "1")
    assert not supported(8, 0.1)
