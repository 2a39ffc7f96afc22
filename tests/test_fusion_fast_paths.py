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
