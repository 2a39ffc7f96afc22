"""Glimpse-attention op: dispatch + composed-path equivalence (the Pallas
block itself is verified on real TPU — see ops/pallas_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_attention_networks_tpu.models import layers as L
from vqa_attention_networks_tpu.ops.fusion import two_glimpse_pool
from vqa_attention_networks_tpu.ops.pallas_attention import glimpse_attention


def test_glimpse_attention_matches_inline_stack():
    rng = np.random.default_rng(0)
    n, p, c, a, d = 4, 9, 16, 8, 12
    x = jnp.asarray(rng.standard_normal((n, p, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, p, d)), jnp.float32)
    mlp1 = {"w": jnp.asarray(rng.standard_normal((c, a)) * 0.1, jnp.float32),
            "b": jnp.zeros(a, jnp.float32)}
    mlp2 = {"w": jnp.asarray(rng.standard_normal((a, 2)) * 0.1, jnp.float32),
            "b": jnp.zeros(2, jnp.float32)}

    got = glimpse_attention(x, mlp1, mlp2, v, uniform_quirk=False)

    logits = L.dense(mlp2, jax.nn.relu(L.dense(mlp1, x)))
    want = two_glimpse_pool(logits, v, uniform_quirk=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_glimpse_attention_uniform_quirk_ignores_mlp():
    rng = np.random.default_rng(1)
    n, p, c, d = 2, 5, 8, 6
    x = jnp.asarray(rng.standard_normal((n, p, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, p, d)), jnp.float32)
    mlp1 = {"w": jnp.asarray(rng.standard_normal((c, 4)), jnp.float32),
            "b": jnp.zeros(4, jnp.float32)}
    mlp2 = {"w": jnp.asarray(rng.standard_normal((4, 2)), jnp.float32),
            "b": jnp.zeros(2, jnp.float32)}
    got = np.asarray(glimpse_attention(x, mlp1, mlp2, v, uniform_quirk=True))
    want = np.asarray(v.sum(axis=1))
    np.testing.assert_allclose(got[:, :d], want, rtol=1e-5)
    np.testing.assert_allclose(got[:, d:], want, rtol=1e-5)
