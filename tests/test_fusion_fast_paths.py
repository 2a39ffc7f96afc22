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
