"""Fast fusion formulations vs the composed oracle."""

import jax.numpy as jnp
import numpy as np

from vqa_attention_networks_tpu.ops.fusion import (
    grid_fuse_weight_contracted,
)
from vqa_attention_networks_tpu.ops.pallas_fusion import (
    _grid_fuse_reference,
    grid_fuse,
)


def _data(n=4, l=8, d=32, f=40, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((n, l, d)).astype(np.float32)
    w = (rng.standard_normal((d, f)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(f) * 0.1).astype(np.float32)
    q = rng.standard_normal((n, f)).astype(np.float32)
    return img, w, b, q


def test_weight_contracted_matches_composed_loosely():
    # bf16 weight rounding + reordered sums under the signed sqrt: loose
    # tolerance; exactness is the f32/composed path's job
    img, w, b, q = _data()
    got = np.asarray(grid_fuse_weight_contracted(
        jnp.asarray(img), jnp.asarray(w), jnp.asarray(b), jnp.asarray(q), 5
    ))
    want = np.asarray(_grid_fuse_reference(
        jnp.asarray(img), jnp.asarray(w), jnp.asarray(b), jnp.asarray(q), 5
    ))
    assert got.shape == want.shape == (4, 8, 8)
    # overall agreement: small mean error, bounded worst case
    err = np.abs(got - want)
    assert err.mean() < 0.02
    assert np.quantile(err, 0.95) < 0.1


def test_weight_contracted_exact_in_float64_math():
    # with the rounding removed (all-f64 NumPy), the reformulation is exact
    img, w, b, q = _data(seed=1)
    k = 5
    n, l, d = img.shape
    o = w.shape[1] // k
    z = (img.astype(np.float64) @ w.astype(np.float64) + b) * q[:, None, :]
    pooled_ref = z.reshape(n, l, o, k).sum(-1)
    wq = np.einsum(
        "dok,nok->ndo", w.reshape(d, o, k).astype(np.float64),
        q.reshape(n, o, k).astype(np.float64),
    )
    bq = np.einsum(
        "ok,nok->no",
        b.reshape(o, k).astype(np.float64),
        q.reshape(n, o, k).astype(np.float64),
    )
    pooled_wq = np.einsum("nld,ndo->nlo", img.astype(np.float64), wq) + bq[:, None]
    np.testing.assert_allclose(pooled_wq, pooled_ref, rtol=1e-9, atol=1e-10)


def test_grid_fuse_train_path_is_composed():
    # training must use the composed chain (dropout on the pre-pool product)
    import jax

    img, w, b, q = _data(seed=2)
    params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    out = grid_fuse(
        jnp.asarray(img), params, jnp.asarray(q), 5,
        rng=jax.random.PRNGKey(0), dropout_rate=0.0, train=True,
    )
    want = _grid_fuse_reference(
        jnp.asarray(img), jnp.asarray(w), jnp.asarray(b), jnp.asarray(q), 5
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_fast_path_policy_gates_wq_dispatch(monkeypatch):
    """config.fast_path: 'composed' must bypass the wq kernel even where
    supported() says yes; 'auto'/'pallas' dispatch it (the serving
    fallback when a measured flip rate exceeds the 0.1% budget)."""
    import jax

    from vqa_attention_networks_tpu.config import Config
    from vqa_attention_networks_tpu.models import get_model
    from vqa_attention_networks_tpu.ops import pallas_wq_fusion as wqf

    cfg = Config(
        model_name="mhb_coAtt", q_vocab_size=25, a_vocab_size=11,
        hidden_dim=16, emb_dim=8, img_feature_channel=32,
        max_question_length=7, mfb_factor=5, mfb_out=8,
    ).validate()
    model = get_model("mhb_coAtt")
    params = model.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 196, 32)).astype(np.float32)
    ques = rng.integers(0, 25, size=(2, 7)).astype(np.int32)

    calls = []
    monkeypatch.setattr(wqf, "supported", lambda *a, **k: True)

    def fake_stage1(*a, **k):
        calls.append(k.get("pair", False))
        raise RuntimeError("dispatched")

    monkeypatch.setattr(wqf, "stage1_coattention", fake_stage1)

    # composed: the kernel must NOT be touched
    logits, _ = model.apply(
        params, cfg.replace(fast_path="composed"), img, ques
    )
    assert not calls and logits.shape == (2, 11)

    # auto/pallas dispatch (the fake raises to prove it was reached);
    # auto promotes the pair kernel on EVEN batches (r4 hardware A/B win),
    # "pallas" forces single, "pallas_pair" forces pair
    for mode in ("auto", "pallas", "pallas_pair"):
        with np.testing.assert_raises(RuntimeError):
            model.apply(params, cfg.replace(fast_path=mode), img, ques)
    assert calls == [True, False, True]

    # odd batch under auto: the direct (non-SPMD) pair kernel needs an even
    # batch, so auto falls back to the single-sample kernel at trace time
    calls.clear()
    with np.testing.assert_raises(RuntimeError):
        model.apply(params, cfg, img[:1], ques[:1])
    assert calls == [False]

    # unknown policy values are rejected at validate()
    with np.testing.assert_raises(ValueError):
        cfg.replace(fast_path="fast").validate()


def test_flip_rate_upper_bound():
    """The gate's statistical-resolution line: rule of three at zero
    observed flips, Wilson above; the binding-run design point (N=8192,
    0 flips) must bound the true rate below the 1e-3 budget while a
    too-small PASS (N=512) must not."""
    from benchmarks.bench_precision import flip_rate_upper_bound

    assert flip_rate_upper_bound(0.0, 8192) == 3.0 / 8192 < 1e-3
    assert flip_rate_upper_bound(0.0, 512) > 1e-3
    # observed flips: Wilson upper bound sits above the point estimate
    # and shrinks with N
    u1 = flip_rate_upper_bound(0.001, 8192)
    u2 = flip_rate_upper_bound(0.001, 64 * 8192)
    assert u1 > 0.001 and u2 > 0.001
    assert u2 < u1
    # monotone in the observed rate
    assert flip_rate_upper_bound(0.01, 8192) > u1


def test_bench_precision_trained_gate_smoke(capsys):
    """CPU smoke of the flip-rate methodology: tiny dims, a few train
    steps; on CPU the kernel is not dispatched so the gate reports itself
    vacuous instead of passing silently."""
    from benchmarks import bench_precision as bp

    bp.main([
        "--batch", "8", "--batches", "2", "--train_steps", "2",
        "--q_vocab", "25", "--a_vocab", "11",
    ])
    out = capsys.readouterr().out
    assert "train step 2/2" in out
    assert "argmax" in out
    assert "NOT dispatched" in out  # CPU: gate must be explicit, not PASS


# ---------------------------------------------------------------------------
# dropout_site="pooled": the weight-contracted fast-train mode (round 5)
# ---------------------------------------------------------------------------


def test_grid_fuse_pooled_rate0_matches_composed_f32():
    """Dropout off, f32 inputs: the pooled-site train path is the
    weight-contracted contraction in the INPUT dtype — same math as the
    composed chain up to sum reordering (no bf16 rounding)."""
    import jax

    img, w, b, q = _data(seed=3)
    params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    out = grid_fuse(
        jnp.asarray(img), params, jnp.asarray(q), 5,
        rng=jax.random.PRNGKey(0), dropout_rate=0.0, train=True,
        site="pooled",
    )
    want = _grid_fuse_reference(
        jnp.asarray(img), jnp.asarray(w), jnp.asarray(b), jnp.asarray(q), 5
    )
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5,
                               atol=1e-6)


def test_grid_fuse_pooled_dropout_masks_whole_units():
    """rate>0: survivors are the rate-0 output scaled by 1/keep; dropped
    entries are exactly zero; the empirical drop fraction is ~rate."""
    import jax

    img, w, b, q = _data(n=8, l=16, seed=4)
    params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    base = np.asarray(grid_fuse(
        jnp.asarray(img), params, jnp.asarray(q), 5,
        rng=jax.random.PRNGKey(0), dropout_rate=0.0, train=True,
        site="pooled",
    ))
    rate = 0.5
    out = np.asarray(grid_fuse(
        jnp.asarray(img), params, jnp.asarray(q), 5,
        rng=jax.random.PRNGKey(1), dropout_rate=rate, train=True,
        site="pooled",
    ))
    dropped = out == 0.0
    frac = dropped.mean()
    assert 0.4 < frac < 0.6, frac
    np.testing.assert_allclose(
        out[~dropped], base[~dropped] / (1.0 - rate), rtol=1e-5, atol=1e-6
    )


def test_grid_fuse_pooled_grads_match_composed_at_rate0():
    """Autodiff through the pooled path (incl. the jax.checkpoint around
    the contracted forward): with dropout off, gradients agree with the
    composed chain's for every input."""
    import jax

    img, w, b, q = _data(seed=5)
    key = jax.random.PRNGKey(0)

    def loss_pooled(img, w, b, q):
        out = grid_fuse(
            jnp.asarray(img), {"w": w, "b": b}, q, 5,
            rng=key, dropout_rate=0.0, train=True, site="pooled",
        )
        return jnp.sum(out * out)

    def loss_composed(img, w, b, q):
        out = _grid_fuse_reference(img, w, b, q, 5)
        return jnp.sum(out * out)

    args = tuple(map(jnp.asarray, (img, w, b, q)))
    g_pooled = jax.grad(loss_pooled, argnums=(0, 1, 2, 3))(*args)
    g_comp = jax.grad(loss_composed, argnums=(0, 1, 2, 3))(*args)
    for gp, gc in zip(g_pooled, g_comp):
        assert bool(jnp.isfinite(gp).all())
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gc),
                                   rtol=2e-4, atol=2e-5)


def test_pooled_site_flagship_train_dynamics():
    """mhb_coAtt under dropout_site='pooled': a tiny Adam run must reduce
    the loss (the fast-train mode is a working training path end to end)."""
    import jax
    import optax

    from vqa_attention_networks_tpu.config import Config
    from vqa_attention_networks_tpu.models import get_model
    from vqa_attention_networks_tpu.train.losses import soft_cross_entropy

    cfg = Config(
        model_name="mhb_coAtt", q_vocab_size=37, a_vocab_size=11,
        hidden_dim=32, emb_dim=16, img_feature_channel=64,
        max_question_length=6, mfb_factor=5, mfb_out=8,
        dropout_site="pooled",
    ).validate()
    model = get_model(cfg.model_name)
    params = model.init(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    rng = np.random.default_rng(0)
    n = 16
    img = jnp.asarray(rng.standard_normal(
        (n, cfg.img_feature_dim, cfg.img_feature_channel)).astype(np.float32))
    ques = jnp.asarray(rng.integers(0, cfg.q_vocab_size, (n, 6)), jnp.int32)
    soft = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((n, 11)).astype(np.float32)) * 3)

    @jax.jit
    def step(p, o, k):
        def loss_fn(p):
            logits, _ = model.apply(p, cfg, img, ques, train=True, rng=k)
            return soft_cross_entropy(logits, soft)
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(40):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # soft targets put a floor at the target entropy; require a clear
    # relative drop of the excess loss
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])


def test_config_rejects_bad_dropout_site():
    import pytest

    from vqa_attention_networks_tpu.config import Config

    with pytest.raises(ValueError, match="dropout_site"):
        Config(model_name="mfb", q_vocab_size=10, a_vocab_size=5,
               dropout_site="post").validate()
