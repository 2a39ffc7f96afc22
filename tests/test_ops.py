"""Kernel-level tests: fusion primitives + the Pallas grid-fusion kernel
(interpreter mode on CPU; the real-TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from vqa_attention_networks_tpu.ops.fusion import mfb_sumpool, two_glimpse_pool
from vqa_attention_networks_tpu.ops.pallas_fusion import (
    _grid_fuse_pallas,
    _grid_fuse_reference,
    grid_fuse,
)


def test_mfb_sumpool_channel_order():
    # channel c maps to (c // k, c % k): output-major (mfb.py:100-101)
    z = jnp.arange(10, dtype=jnp.float32)[None, :]  # o=2, k=5
    out = np.asarray(mfb_sumpool(z, 5))
    np.testing.assert_allclose(out, [[0 + 1 + 2 + 3 + 4, 5 + 6 + 7 + 8 + 9]])


def test_two_glimpse_real_softmax_weights_sum_to_one():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 5, 2)).astype(np.float32)
    vals = np.ones((2, 5, 3), np.float32)
    pooled = np.asarray(two_glimpse_pool(logits, vals, uniform_quirk=False))
    # softmax weights sum to 1 over positions -> pooling ones gives ones
    np.testing.assert_allclose(pooled, np.ones((2, 6)), rtol=1e-5)


import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("VQA_RUN_INTERPRET_TESTS"),
    reason="Pallas interpret-mode lowering takes >7 min of XLA compile on a "
    "1-core host; run with VQA_RUN_INTERPRET_TESTS=1. The kernel's numerics "
    "are verified against the XLA twin on real TPU (see "
    "ops/pallas_fusion.py docstring: 3e-5 max abs diff in bf16).",
)
def test_grid_fuse_kernel_matches_reference_interpret():
    rng = np.random.default_rng(2)
    n, l, d, f, k = 4, 8, 128, 640, 5
    img = rng.standard_normal((n, l, d)).astype(np.float32)
    w = (rng.standard_normal((d, f)) * 0.05).astype(np.float32)
    b = (rng.standard_normal(f) * 0.1).astype(np.float32)
    q = rng.standard_normal((n, f)).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_grid_fuse_pallas(
            jnp.asarray(img), jnp.asarray(w), jnp.asarray(b), jnp.asarray(q),
            k, nb=2, tf=320,
        ))
    want = np.asarray(_grid_fuse_reference(
        jnp.asarray(img), jnp.asarray(w), jnp.asarray(b), jnp.asarray(q), k
    ))
    assert got.shape == (n, l, f // k)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_grid_fuse_dispatch_fallback_on_cpu():
    # on the CPU backend grid_fuse must take the XLA path and stay correct
    rng = np.random.default_rng(3)
    n, l, d, f, k = 2, 4, 16, 20, 5
    img = rng.standard_normal((n, l, d)).astype(np.float32)
    params = {
        "w": (rng.standard_normal((d, f)) * 0.1).astype(np.float32),
        "b": np.zeros(f, np.float32),
    }
    q = rng.standard_normal((n, f)).astype(np.float32)
    out = grid_fuse(jnp.asarray(img), params, jnp.asarray(q), k)
    want = _grid_fuse_reference(
        jnp.asarray(img), jnp.asarray(params["w"]), jnp.asarray(params["b"]),
        jnp.asarray(q), k,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


def test_grid_fuse_gradients_flow():
    rng = np.random.default_rng(4)
    n, l, d, f, k = 2, 4, 16, 20, 5
    img = jnp.asarray(rng.standard_normal((n, l, d)).astype(np.float32))
    params = {
        "w": jnp.asarray((rng.standard_normal((d, f)) * 0.1).astype(np.float32)),
        "b": jnp.zeros(f, jnp.float32),
    }
    q = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    def loss(p, img, q):
        return jnp.sum(grid_fuse(img, p, q, k) ** 2)

    grads = jax.grad(loss)(params, img, q)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
