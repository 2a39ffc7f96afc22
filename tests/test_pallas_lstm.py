"""Interpret-mode parity of the Pallas LSTM scan kernel (ops/pallas_lstm.py)
against the composed layers.lstm (the production path — see the module
docstring for why the kernel is not dispatched)."""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_attention_networks_tpu.models import layers as L
from vqa_attention_networks_tpu.ops.pallas_lstm import lstm_seq


def test_lstm_kernel_matches_composed_interpret():
    n, t, e, h = 8, 5, 16, 128
    rng = jax.random.PRNGKey(0)
    p = L.lstm_init(rng, e, h)
    x = (jax.random.normal(rng, (n, t, e), jnp.float32) * 0.5).astype(
        jnp.bfloat16
    )
    want = np.asarray(L.lstm(p, x), np.float32)
    got = np.asarray(lstm_seq(p, x, interpret=True), np.float32)
    assert got.shape == want.shape == (n, t, h)
    # kernel accumulates gates/cell in f32 where the composed bf16 scan
    # rounds — bf16-resolution tolerance
    np.testing.assert_allclose(got, want, atol=0.02, rtol=0.05)


def test_lstm_kernel_carry_resets_between_batch_tiles():
    # two batch tiles (nb divides n): the carry must reset at t == 0 for the
    # second tile rather than leak the first tile's final state
    n, t, e, h = 16, 4, 8, 128
    rng = jax.random.PRNGKey(1)
    p = L.lstm_init(rng, e, h)
    x = (jax.random.normal(rng, (n, t, e), jnp.float32) * 0.5).astype(
        jnp.bfloat16
    )
    full = np.asarray(lstm_seq(p, x, interpret=True, nb=8), np.float32)
    half = np.asarray(lstm_seq(p, x[8:], interpret=True, nb=8), np.float32)
    np.testing.assert_allclose(full[8:], half, atol=1e-4, rtol=1e-3)


def test_explicit_nondividing_nb_is_rejected():
    import jax
    import jax.numpy as jnp
    import pytest

    from vqa_attention_networks_tpu.models import layers as L
    from vqa_attention_networks_tpu.ops.pallas_lstm import lstm_seq

    p = L.lstm_init(jax.random.PRNGKey(0), 8, 16)
    x = jnp.zeros((6, 4, 8))
    with pytest.raises(ValueError, match="does not divide"):
        lstm_seq(p, x, nb=4)
