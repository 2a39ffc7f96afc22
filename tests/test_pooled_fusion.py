"""Parity tests for the pooled-site train kernels (ops/pallas_pooled_fusion).

The kernels have no in-kernel PRNG (the pooled-site mask lives outside,
ops/fusion.py grid_fuse_pooled), so unlike the pre-pool train kernel they
execute under the Pallas interpreter on CPU: forward AND gradients are
pinned here against a mirror of the kernels' explicit numerics (f32 wq
accumulation, bf16 MXU operands, f32 dot accumulation) and against the
composed XLA pooled chain they replace.

The real-TPU leg lives in the VQA_TEST_PLATFORM=tpu gate at the bottom
(tools/hw_remeasure.py tpu_tests step runs this file on hardware). The
interpret-mode tests SKIP on a real TPU backend: there the open dispatch
gate would send these deliberately tiny shapes through a real Mosaic
compile (measured: minutes-slow through the dev relay, and redundant —
the hardware leg covers production dims).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_attention_networks_tpu.ops import pallas_pooled_fusion as ppf
from vqa_attention_networks_tpu.ops.fusion import grid_fuse_pooled

N, L, D, K, O = 3, 5, 16, 5, 8
F = O * K

_interpret_only = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode parity test (tiny dims); the TPU leg is "
           "test_tpu_parity_production_dims",
)


def _inputs(seed=0, dtype=jnp.bfloat16):
    r = np.random.RandomState(seed)
    img = jnp.asarray(r.randn(N, L, D), dtype)
    w = jnp.asarray(r.randn(D, F) * 0.1, dtype)
    b = jnp.asarray(r.randn(F) * 0.1, jnp.float32)
    q = jnp.asarray(r.randn(N, F), dtype)
    return img, w, b, q


def _mirror(img, w, b, q_proj, k):
    """The kernels' numerics in plain jnp: f32-accumulated wq rounded to
    bf16 before the MXU dot, f32 dot accumulation, f32 bq."""
    n, l, d = img.shape
    o = w.shape[1] // k
    w3 = w.reshape(d, o, k).astype(jnp.float32)
    q3 = q_proj.reshape(n, o, k).astype(jnp.float32)
    wq = jnp.einsum("dok,nok->ndo", w3, q3).astype(jnp.bfloat16)
    bq = jnp.einsum("ok,nok->no", b.reshape(o, k).astype(jnp.float32), q3)
    pooled = jnp.einsum(
        "nld,ndo->nlo", img.astype(jnp.bfloat16), wq,
        preferred_element_type=jnp.float32,
    ) + bq[:, None, :]
    return jnp.sqrt(jax.nn.relu(pooled)) - jnp.sqrt(jax.nn.relu(-pooled))


@_interpret_only
def test_forward_matches_mirror_interpret():
    img, w, b, q = _inputs()
    out = ppf.pooled_grid_fuse(img, w, b, q, K)
    ref = _mirror(img, w, b, q, K)
    assert out.shape == (N, L, O)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


@_interpret_only
def test_gradients_match_mirror_interpret():
    img, w, b, q = _inputs(1)
    cot = jnp.asarray(
        np.random.RandomState(9).randn(N, L, O), jnp.float32
    )

    def loss_kernel(img, w, b, q):
        return jnp.sum(ppf.pooled_grid_fuse(img, w, b, q, K) * cot)

    def loss_ref(img, w, b, q):
        return jnp.sum(_mirror(img, w, b, q, K) * cot)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(img, w, b, q)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(img, w, b, q)
    for a, e, name in zip(gk, gr, ("d_img", "d_w", "d_b", "d_q")):
        assert a.shape == e.shape and a.dtype == e.dtype, name
        # atol covers the bf16 quantisation of the kernel's g_pooled cast
        # (the mirror's autodiff keeps the cotangent f32)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(e, np.float32),
            rtol=3e-2, atol=2e-2, err_msg=name,
        )


@_interpret_only
def test_dispatch_parity_vs_composed(monkeypatch):
    """grid_fuse_pooled with the kernel gate open (interpret proxy) vs the
    composed XLA chain: same mask (the dropout draw sees identical shape/
    rng), close values."""
    img, w, b, q = _inputs(2)
    rng = jax.random.PRNGKey(3)

    monkeypatch.setenv("VQA_PALLAS_INTERPRET", "1")
    assert ppf.supported(N, F, K, D)
    out_k = grid_fuse_pooled(img, w, b, q, K, rng=rng, dropout_rate=0.3,
                             train=True)
    monkeypatch.setenv("VQA_COMPOSED_POOLED_FUSION", "1")
    assert not ppf.supported(N, F, K, D)
    out_x = grid_fuse_pooled(img, w, b, q, K, rng=rng, dropout_rate=0.3,
                             train=True)
    assert out_k.dtype == out_x.dtype == img.dtype
    # identical dropout mask -> zeros agree exactly
    np.testing.assert_array_equal(
        np.asarray(out_k) == 0, np.asarray(out_x) == 0
    )
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_x, np.float32),
        rtol=2e-2, atol=2e-3,
    )


def test_spmd_grads_match_single_device(monkeypatch):
    """Batch-sharded mesh vs single device: the custom_partitioning
    wrappers shard the per-sample kernels over the batch axis and psum the
    d_W/d_b partial sums — gradients must match the unsharded run
    exactly (the psum adds the same per-shard f32 partials XLA's own DP
    all-reduce would)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs a 4-device mesh (emulated CPU devices; the "
                    "dev TPU backend exposes one chip)")
    monkeypatch.setenv("VQA_PALLAS_INTERPRET", "1")
    n = 8
    r = np.random.RandomState(4)
    img = jnp.asarray(r.randn(n, L, D), jnp.bfloat16)
    w = jnp.asarray(r.randn(D, F) * 0.1, jnp.bfloat16)
    b = jnp.asarray(r.randn(F) * 0.1, jnp.float32)
    q = jnp.asarray(r.randn(n, F), jnp.bfloat16)
    cot = jnp.asarray(r.randn(n, L, O), jnp.float32)

    def loss(img, w, b, q):
        return jnp.sum(ppf.pooled_grid_fuse(img, w, b, q, K) * cot)

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(img, w, b, q)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    g4 = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(
        jax.device_put(img, NamedSharding(mesh, P("data"))),
        jax.device_put(w, NamedSharding(mesh, P())),
        jax.device_put(b, NamedSharding(mesh, P())),
        jax.device_put(q, NamedSharding(mesh, P("data"))),
    )
    for a, e, name in zip(g4, g1, ("d_img", "d_w", "d_b", "d_q")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(e, np.float32),
            rtol=1e-5, atol=1e-5, err_msg=name,
        )


def test_supported_gates(monkeypatch):
    on_tpu = jax.default_backend() == "tpu"
    # CPU backend without the proxy: gate closed (composed path serves);
    # on a real TPU backend the gate is open BY DESIGN
    monkeypatch.delenv("VQA_PALLAS_INTERPRET", raising=False)
    assert ppf.supported(N, F, K, D) == on_tpu
    monkeypatch.setenv("VQA_PALLAS_INTERPRET", "1")
    assert ppf.supported(N, F, K, D)
    monkeypatch.setenv("VQA_DISABLE_PALLAS", "1")
    assert not ppf.supported(N, F, K, D)
    monkeypatch.delenv("VQA_DISABLE_PALLAS")
    assert not ppf.supported(N, F + 1, K, D)  # f % k
    # VMEM budget: a resident weight beyond ~80 MB must fall back
    assert not ppf.supported(N, 5 * 8192 * K, K, 8192)


@pytest.mark.skipif(
    os.environ.get("VQA_TEST_PLATFORM") != "tpu",
    reason="real-TPU leg (set VQA_TEST_PLATFORM=tpu)",
)
def test_tpu_parity_production_dims():
    """Mosaic-on-hardware vs the composed XLA pooled chain at production
    width (small batch): values and gradients."""
    n, l, d, k, f = 8, 196, 2048, 5, 5000
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(n, l, d), jnp.bfloat16)
    w = jnp.asarray(r.randn(d, f) * 0.05, jnp.bfloat16)
    b = jnp.asarray(r.randn(f) * 0.05, jnp.float32)
    q = jnp.asarray(r.randn(n, f), jnp.bfloat16)
    cot = jnp.asarray(r.randn(n, l, f // k), jnp.float32)

    def loss_kernel(img, w, b, q):
        return jnp.sum(ppf.pooled_grid_fuse(img, w, b, q, k) * cot)

    def loss_ref(img, w, b, q):
        return jnp.sum(_mirror(img, w, b, q, k) * cot)

    vk, gk = jax.jit(jax.value_and_grad(loss_kernel, argnums=(0, 1, 2, 3)))(
        img, w, b, q)
    vr, gr = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3)))(
        img, w, b, q)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-3)
    for a, e, name in zip(gk, gr, ("d_img", "d_w", "d_b", "d_q")):
        a = np.asarray(a, np.float32)
        e = np.asarray(e, np.float32)
        # relative-L2 + an outlier-fraction bound are the right metrics for
        # bf16 gradients at this size: a ~1e-5 fraction of few-ulp
        # accumulation-order outliers is expected and harmless; a
        # systematic error is not (elementwise allclose on 10M bf16
        # elements always trips on the quantisation tail)
        rel_l2 = np.linalg.norm(a - e) / max(np.linalg.norm(e), 1e-20)
        assert rel_l2 < 1e-2, f"{name}: rel_l2={rel_l2}"
        rms = np.linalg.norm(e) / np.sqrt(e.size)
        frac = float(np.mean(np.abs(a - e) > 0.2 * rms))
        assert frac < 1e-4, f"{name}: outlier fraction {frac}"
