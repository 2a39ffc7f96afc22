"""A/B: VMEM-resident wq Pallas kernel vs the XLA weight-contracted chain
(stage-1 fusion + grid L2) at production shapes. Also checks numerics."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timeit_last
from vqa_attention_networks_tpu.models.layers import l2_normalize
from vqa_attention_networks_tpu.ops.fusion import grid_fuse_weight_contracted
from vqa_attention_networks_tpu.ops.pallas_wq_fusion import (
    _composed_reference,
    _wq_grid_fuse_tpu,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    args = parser.parse_args(argv)
    n, l, d, f, k = args.batch, 196, 2048, 5000, 5

    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
    img = jax.random.normal(k0, (n, l, d), jnp.bfloat16)
    w = jax.random.normal(k1, (d, f), jnp.float32) * 0.02
    b = jax.random.normal(k2, (f,), jnp.float32) * 0.02
    q = jax.random.normal(k3, (n, f), jnp.bfloat16).astype(jnp.float32)

    @jax.jit
    def xla_path(img, w, b, q):
        z = grid_fuse_weight_contracted(img, w, b, q, k)
        return jnp.sum(
            l2_normalize(z.reshape(n, -1)).reshape(z.shape)
            .astype(jnp.float32)
        )

    @jax.jit
    def pallas_path(img, w, b, q):
        return jnp.sum(_wq_grid_fuse_tpu(img, w, b, q, k)
                       .astype(jnp.float32))

    @jax.jit
    def composed_f32(img, w, b, q):
        return _composed_reference(img.astype(jnp.float32), w, b, q, k)

    # numerics: kernel vs f32 composed truth on a small slice
    small = 8
    got = np.asarray(jax.jit(
        lambda *a: _wq_grid_fuse_tpu(*a, k)
    )(img[:small], w, b, q[:small]), np.float32)
    want = np.asarray(composed_f32(img[:small], w, b, q[:small]), np.float32)
    err = np.abs(got - want)
    denom = np.abs(want) + 1e-3
    print(f"kernel vs f32-composed: mean|err| {err.mean():.2e}, "
          f"p99 rel {np.quantile(err / denom, 0.99):.3f}", flush=True)

    t_x = timeit_last(xla_path, img, w, b, q, iters=16, trials=3)
    print(f"XLA weight-contracted + L2 : {t_x * 1e3:8.3f} ms/batch "
          f"({n / t_x:10.0f} qa-pairs/s)", flush=True)
    t_p = timeit_last(pallas_path, img, w, b, q, iters=16, trials=3)
    print(f"Pallas wq kernel (fused L2): {t_p * 1e3:8.3f} ms/batch "
          f"({n / t_p:10.0f} qa-pairs/s)  [{t_x / t_p:.2f}x]", flush=True)

    # ---- combined stage-1 + co-attention glimpse ---------------------------
    from vqa_attention_networks_tpu.ops.pallas_wq_fusion import (
        _composed_stage1_coatt,
        _stage1_coatt_tpu,
    )

    c = 512
    k4, k5, k6, k7 = jax.random.split(jax.random.PRNGKey(1), 4)
    c1w = jax.random.normal(k4, (f // k, c), jnp.float32) * 0.05
    c1b = jax.random.normal(k5, (c,), jnp.float32) * 0.05
    c2w = jax.random.normal(k6, (c, 2), jnp.float32) * 0.05
    c2b = jax.random.normal(k7, (2,), jnp.float32) * 0.05

    got = np.asarray(jax.jit(
        lambda *a: _stage1_coatt_tpu(*a, k)
    )(img[:small], w, b, q[:small], c1w, c1b, c2w, c2b), np.float32)
    want = np.asarray(_composed_stage1_coatt(
        img[:small].astype(jnp.float32), w, b, q[:small], c1w, c1b, c2w, c2b,
        k,
    ), np.float32)
    err = np.abs(got - want)
    print(f"combined kernel vs f32-composed: mean|err| {err.mean():.2e}, "
          f"p99 rel {np.quantile(err / (np.abs(want) + 1e-3), 0.99):.3f}",
          flush=True)

    @jax.jit
    def xla_combined(img, w, b, q):
        return jnp.sum(_composed_stage1_coatt(
            img, w, b, q, c1w, c1b, c2w, c2b, k
        ).astype(jnp.float32))

    @jax.jit
    def pallas_combined(img, w, b, q):
        return jnp.sum(_stage1_coatt_tpu(
            img, w, b, q, c1w, c1b, c2w, c2b, k
        ).astype(jnp.float32))

    t_xc = timeit_last(xla_combined, img, w, b, q, iters=16, trials=3)
    print(f"XLA stage1+coatt           : {t_xc * 1e3:8.3f} ms/batch "
          f"({n / t_xc:10.0f} qa-pairs/s)", flush=True)
    t_pc = timeit_last(pallas_combined, img, w, b, q, iters=16, trials=3)
    print(f"Pallas stage1+coatt fused  : {t_pc * 1e3:8.3f} ms/batch "
          f"({n / t_pc:10.0f} qa-pairs/s)  [{t_xc / t_pc:.2f}x]", flush=True)

    # ---- experimental two-samples-per-instance variant (round-3 MFU push):
    # interleaved emission lets Mosaic overlap sample B's VPU wq-gen with
    # sample A's MXU matmul IF its scheduler exploits the independence
    from vqa_attention_networks_tpu.ops.pallas_wq_fusion import (
        fused_stage1_coattention_pallas_pair,
    )

    got = np.asarray(jax.jit(
        lambda *a: fused_stage1_coattention_pallas_pair(*a, k)
    )(img[:small], w, b, q[:small], c1w, c1b, c2w, c2b), np.float32)
    # pair kernel emits [N, G, D]; the composed reference is flat [N, G*D]
    err = np.abs(got.reshape(small, -1) - np.asarray(want, np.float32))
    print(f"pair kernel vs f32-composed: mean|err| {err.mean():.2e}",
          flush=True)

    @jax.jit
    def pallas_pair(img, w, b, q):
        return jnp.sum(fused_stage1_coattention_pallas_pair(
            img, w, b, q, c1w, c1b, c2w, c2b, k
        ).astype(jnp.float32))

    t_pp = timeit_last(pallas_pair, img, w, b, q, iters=16, trials=3)
    print(f"Pallas PAIR stage1+coatt   : {t_pp * 1e3:8.3f} ms/batch "
          f"({n / t_pp:10.0f} qa-pairs/s)  [{t_pc / t_pp:.2f}x vs single]",
          flush=True)


if __name__ == "__main__":
    main()
