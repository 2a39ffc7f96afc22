"""Per-stage timing breakdown of the flagship bf16 inference forward.

Times each stage of mhb_coAtt.apply in isolation at production shapes so
optimisation effort lands where the milliseconds are.

Usage: python benchmarks/bench_flagship_breakdown.py [--batch 1024]
"""

import argparse

import jax
import jax.numpy as jnp

from benchmarks.common import timeit_last
from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.models import layers as L
from vqa_attention_networks_tpu.ops.fusion import grid_fuse_weight_contracted
from vqa_attention_networks_tpu.ops.pallas_attention import glimpse_attention


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    args = parser.parse_args(argv)
    n = args.batch

    cfg = Config(
        model_name="mhb_coAtt", q_vocab_size=15881, a_vocab_size=1000,
        compute_dtype="bfloat16",
    ).validate()
    model = get_model(cfg.model_name)
    params = jax.device_put(model.init(jax.random.PRNGKey(0), cfg))

    rng = jax.random.PRNGKey(1)
    img = jax.random.normal(rng, (n, 196, 2048), jnp.bfloat16)
    ques = jax.random.randint(rng, (n, 22), 0, cfg.q_vocab_size, jnp.int32)
    h_seq = jax.random.normal(rng, (n, 22, 1024), jnp.bfloat16)
    q_att = jax.random.normal(rng, (n, 2048), jnp.bfloat16)
    fused = jax.random.normal(rng, (n, 196, 1000), jnp.bfloat16)
    v_att = jax.random.normal(rng, (n, 4096), jnp.bfloat16)

    def stage(name, fn, *xs):
        # reduce the stage output to one f32 scalar INSIDE the jit: the relay
        # fetch is ~tens of ms per MB, so fetching a stage's real output
        # (tens of MB) would swamp the stage time being measured
        def scalarized(*a):
            leaves = jax.tree_util.tree_leaves(fn(*a))
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

        f = jax.jit(scalarized)
        t = timeit_last(f, *xs, iters=16, trials=3)
        print(f"{name:34s} {t * 1e3:8.3f} ms/batch "
              f"({n / t:10.0f} qa-pairs/s)", flush=True)
        return t

    # full forward
    def full(params, img, ques):
        logits, _ = model.apply(params, cfg, img, ques, train=False)
        return jnp.argmax(logits, axis=-1)

    total = stage("FULL forward", full, params, img, ques)

    # encoder: embed + lstm
    def enc(params, ques):
        emb = jnp.tanh(L.embed(params["word_embedding"], ques, jnp.bfloat16))
        return L.lstm(params["lstm"], emb)

    t_enc = stage("embed+tanh+LSTM(22)", enc, params, ques)

    # question glimpse attention
    def qatt(params, h_seq):
        return glimpse_attention(
            h_seq, params["ques_att_conv1"], params["ques_att_conv2"], h_seq,
            uniform_quirk=False,
        )

    t_qatt = stage("q glimpse attention", qatt, params, h_seq)

    # stage-1 fusion: proj + weight-contracted grid fuse + grid L2
    def fuse1(params, img, q_att):
        q_proj = L.dense(params["ques_proj1"], q_att)
        f = grid_fuse_weight_contracted(
            img, params["img_conv1d"]["w"], params["img_conv1d"]["b"],
            q_proj, cfg.mfb_factor,
        )
        return L.l2_normalize(f.reshape(n, -1)).reshape(f.shape)

    t_fuse = stage("stage-1 fuse (wq-contracted)+L2", fuse1, params, img, q_att)

    # pieces of the fuse
    def wq_only(params, q_att):
        q_proj = L.dense(params["ques_proj1"], q_att)
        w = params["img_conv1d"]["w"]
        d, f = w.shape
        o = f // cfg.mfb_factor
        w3 = w.reshape(d, o, cfg.mfb_factor)
        q3 = q_proj.reshape(n, o, cfg.mfb_factor)
        return jnp.einsum("dok,nok->ndo", w3.astype(jnp.bfloat16),
                          q3.astype(jnp.bfloat16),
                          preferred_element_type=jnp.bfloat16)

    t_wq = stage("  wq materialise [N,2048,1000]", wq_only, params, q_att)

    def bmm_only(wq, img):
        return jnp.einsum("nld,ndo->nlo", img, wq,
                          preferred_element_type=jnp.float32)

    wq = jax.jit(wq_only)(params, q_att)
    t_bmm = stage("  per-sample bmm [196,2048]@[2048,1000]", bmm_only, wq, img)

    # co-attention glimpse over the fused grid
    def coatt(params, fused, img):
        return glimpse_attention(
            fused.astype(img.dtype), params["co_att_conv1"],
            params["co_att_conv2"], img, uniform_quirk=False,
        )

    t_co = stage("co-attention glimpse", coatt, params, fused, img)

    # output fusions + classifier
    def out(params, q_att, v_att):
        outs = []
        for s in ("2", "3"):
            a = L.dense(params[f"ques_proj{s}"], q_att)
            b = L.dense(params[f"img_proj{s}"], v_att)
            from vqa_attention_networks_tpu.ops.fusion import mfb_fuse_pool
            outs.append(L.l2_normalize(mfb_fuse_pool(a, b, cfg.mfb_factor)))
        return L.dense(params["linear_pred"], jnp.concatenate(outs, -1))

    t_out = stage("output fusions+classifier", out, params, q_att, v_att)

    known = t_enc + t_qatt + t_fuse + t_co + t_out
    print(f"{'sum of stages':34s} {known * 1e3:8.3f} ms/batch "
          f"(full: {total * 1e3:.3f})")


if __name__ == "__main__":
    main()
