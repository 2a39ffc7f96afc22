"""Training-step throughput (forward + backward + Adam, one jitted program).

Usage:
    python -m benchmarks.bench_train [--batch 1024] [--rng_impl rbg]
    python -m benchmarks.bench_train --batch 1024 --breakdown

``--breakdown`` gives the train step the same roofline discipline the
inference path got (bench_flagship_breakdown.py): per-stage attribution
(forward / backward / optimizer), dropout-RNG cost (threefry vs the
TPU-accelerated rbg generator vs masks off), and train MFU from the
compiled program's own FLOP count. Data stays device-resident throughout
— host-feed cost is a separate axis (bench_host_pipeline.py measures it;
the device feature bank removes it).

Timing on relayed/tunneled backends follows the bench.py methodology:
dispatch N iterations, fetch only the last output (in-order execution
makes that a correct total-time measurement; see docs/ARCHITECTURE.md
"Benchmark methodology").
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.train.losses import soft_cross_entropy

# v5e (TPU v5 lite) peak bf16 matmul throughput; override for other chips.
PEAK_BF16_TFLOPS = 197.0


def _time_arm(fn, args_fn, iters, fetch):
    """Median-free simple timing: warm once, dispatch `iters`, fetch last."""
    out = fn(*args_fn())
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args_fn())
    out = fn(*args_fn())
    fetch(out)
    return (time.perf_counter() - t0) / iters


def _make_data(cfg, batch):
    """Device-resident example batch, shared across every arm/build.

    At batch 1024 the f32 image tensor alone is 1.6 GB — building it once
    per arm is what OOM'd the first hardware run of ``--breakdown``.
    """
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(k0, (batch, 196, 2048), jnp.bfloat16).astype(
        jnp.float32
    )
    ques = jax.random.randint(k1, (batch, 22), 0, cfg.q_vocab_size, jnp.int32)
    soft = jax.nn.softmax(jax.random.normal(k2, (batch, 1000)))
    return img, ques, soft


def _build(cfg, model, rng_impl, batch, data=None):
    params = jax.device_put(model.init(jax.random.PRNGKey(0), cfg))
    tx = optax.adam(cfg.lr)
    opt_state = jax.jit(tx.init)(params)

    img, ques, soft = _make_data(cfg, batch) if data is None else data
    key = jax.random.key(2, impl=rng_impl)

    def loss_fn(p, img, ques, soft, k):
        logits, _ = model.apply(p, cfg, img, ques, train=True, rng=k)
        return soft_cross_entropy(logits, soft)

    @jax.jit
    def step(p, o, img, ques, soft, k):
        loss, grads = jax.value_and_grad(loss_fn)(p, img, ques, soft, k)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    return dict(params=params, tx=tx, opt_state=opt_state, img=img,
                ques=ques, soft=soft, key=key, loss_fn=loss_fn, step=step)


def _flops_per_step(step, example_args):
    """XLA's own FLOP estimate for the compiled train step (per call)."""
    try:
        compiled = step.lower(*example_args).compile()
        analyses = compiled.cost_analysis()
        a = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
        return float(a.get("flops", 0.0)) or None
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"  (cost_analysis unavailable: {e})")
        return None


ALL_ARMS = ("full", "fwd", "fwd_bwd", "adam", "full_remat", "full_nodrop",
            "full_rng2")


MAIN_ARMS = {"full", "fwd", "fwd_bwd", "adam", "full_remat"}


def _breakdown(args, cfg, model) -> None:
    batch, iters = args.batch, args.iters
    want = set(args.arms.split(",")) if args.arms else set(ALL_ARMS)
    unknown = want - set(ALL_ARMS)
    if unknown:
        # fail BEFORE any compile: each arm is 1-3 min over the relay, so a
        # typo silently timing the wrong subset is an expensive discovery
        raise SystemExit(
            f"--arms: unknown arm(s) {sorted(unknown)}; "
            f"choose from {','.join(ALL_ARMS)}"
        )
    data = _make_data(cfg, batch)
    img, ques, soft = data
    arms = {}

    # the nodrop/rng2 arms build their own params+opt_state; skip the
    # main build when no main arm needs it (a second params+Adam copy is
    # what OOM'd single-arm --arms full_nodrop runs at batch 1024)
    b = None
    if want & MAIN_ARMS or not args.no_flops:
        b = _build(cfg, model, args.rng_impl, batch, data=data)
        p, o, key, tx = b["params"], b["opt_state"], b["key"], b["tx"]

    if want & {"fwd_bwd", "adam"}:
        grad_only = jax.jit(jax.value_and_grad(b["loss_fn"]))
        _, grads = grad_only(p, img, ques, soft, key)
        jax.block_until_ready(grads)

    if "full" in want:
        arms["full"] = _time_arm(
            b["step"], lambda: (p, o, img, ques, soft, key), iters,
            lambda out: np.asarray(out[2]),
        )
    if "fwd" in want:
        fwd = jax.jit(b["loss_fn"])
        arms["fwd"] = _time_arm(
            fwd, lambda: (p, img, ques, soft, key), iters,
            lambda out: np.asarray(out),
        )
    if "fwd_bwd" in want:
        arms["fwd_bwd"] = _time_arm(
            grad_only, lambda: (p, img, ques, soft, key), iters,
            lambda out: np.asarray(out[0]),
        )
    if "adam" in want:
        @jax.jit
        def adam_only(g, o, p):
            updates, o = tx.update(g, o, p)
            return optax.apply_updates(p, updates), o

        arms["adam"] = _time_arm(
            adam_only, lambda: (grads, o, p), iters,
            lambda out: jax.block_until_ready(out[1]),
        )
    if want & {"fwd_bwd", "adam"}:
        del grads  # ~1 params-copy of HBM; only these arms needed it

    if "full_remat" in want:
        # remat arm: jax.checkpoint around the forward — the HBM-for-FLOPs
        # trade the Solver exposes as Config.remat. Reuses p/o/data: no
        # new HBM beyond the step's own activations.
        ck_loss = jax.checkpoint(b["loss_fn"])

        @jax.jit
        def step_remat(p, o, img, ques, soft, k):
            loss, grads = jax.value_and_grad(ck_loss)(p, img, ques, soft, k)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        arms["full_remat"] = _time_arm(
            step_remat, lambda: (p, o, img, ques, soft, key), iters,
            lambda out: np.asarray(out[2]),
        )

    # dropout attribution: the same full step with every mask off. The
    # delta is what the 5 dropout sites cost (mask draw + where + the
    # residuals they add to the backward). Each extra build shares the
    # data tensors and is freed as soon as its arm is timed.
    if "full_nodrop" in want:
        import dataclasses

        cfg_nd = dataclasses.replace(
            cfg, dropout_lstm=0.0, dropout_fusion=0.0, dropout_default=0.0
        )
        bn = _build(cfg_nd, model, args.rng_impl, batch, data=data)
        arms["full_nodrop"] = _time_arm(
            bn["step"], lambda: (bn["params"], bn["opt_state"], img, ques,
                                 soft, bn["key"]), iters,
            lambda out: np.asarray(out[2]),
        )
        del bn

    rng2_impl = None
    if "full_rng2" in want:
        # RNG-impl arm: rbg is TPU-hardware-accelerated; threefry is JAX's
        # reproducible default (Config.rng_impl documents the tradeoff).
        # Keyed "full_rng2" (the name the user asked for via --arms); the
        # concrete impl is reported alongside in the JSON.
        rng2_impl = ("rbg" if args.rng_impl.startswith("threefry")
                     else "threefry2x32")
        bo = _build(cfg, model, rng2_impl, batch, data=data)
        arms["full_rng2"] = _time_arm(
            bo["step"], lambda: (bo["params"], bo["opt_state"], img, ques,
                                 soft, bo["key"]), iters,
            lambda out: np.asarray(out[2]),
        )
        del bo

    flops = None
    kernel_note = ""
    if not args.no_flops:
        flops = _flops_per_step(b["step"], (p, o, img, ques, soft, key))
        # XLA's cost analysis cannot see INSIDE custom calls: when the
        # fused Pallas train kernel serves the grid fusion (bf16 prepool
        # on TPU), its 4 L*D*F matmul passes per sample (forward + d_img
        # + d_W + z0 recompute, ops/pallas_train_fusion.py) are invisible
        # to it — the uncorrected number under-reports train MFU ~13x at
        # production dims. Add the hand count for the grid-fusion models.
        # Gate on the kernel's OWN dispatch predicate (the same call the
        # model makes, ops/pallas_fusion.py:243-248): under
        # VQA_DISABLE_PALLAS / VQA_COMPOSED_TRAIN_FUSION, a batch not
        # divisible by the kernel's block count, or rate outside (0,1),
        # the composed chain serves — and XLA's cost analysis already
        # counts its fusion FLOPs, so adding the hand count there would
        # double-count and inflate the reported MFU ~2.6x.
        from vqa_attention_networks_tpu.ops import pallas_train_fusion as ptf

        if (
            flops
            and cfg.dropout_site == "prepool"
            and cfg.compute_dtype == "bfloat16"
            and cfg.dropout_fusion > 0
            and jax.devices()[0].platform == "tpu"
            and ptf.supported(batch, cfg.dropout_fusion, cfg.fusion_dim,
                              cfg.mfb_factor)
            and cfg.model_name in ("mfb", "mfb-multilayer", "mhb_coAtt")
        ):
            kf = 4 * 2 * cfg.img_feature_dim * cfg.img_feature_channel \
                * cfg.fusion_dim * batch
            flops += kf
            kernel_note = (
                f" (incl. {kf / 1e12:.3f} TF hand-counted fused-train-"
                "kernel matmuls, invisible to XLA cost analysis)"
            )
        # same correction for the pooled-site train kernels
        # (ops/pallas_pooled_fusion.py): 3 MXU passes at L*D*O_pad per
        # sample (forward, d_img, d_wq) plus ~5 VPU wq passes at k*D*O_pad
        # (fwd wq + d_img wq rebuild + d_W/d_b/d_q contractions)
        from vqa_attention_networks_tpu.ops import pallas_pooled_fusion as ppf

        if (
            flops
            and cfg.dropout_site == "pooled"
            and cfg.compute_dtype == "bfloat16"
            and jax.devices()[0].platform == "tpu"
            and ppf.supported(batch, cfg.fusion_dim, cfg.mfb_factor,
                              cfg.img_feature_channel)
            and cfg.model_name in ("mfb", "mfb-multilayer", "mhb_coAtt")
        ):
            o_pad = -(-(cfg.fusion_dim // cfg.mfb_factor) // 128) * 128
            kf = (3 * 2 * cfg.img_feature_dim * cfg.img_feature_channel
                  * o_pad
                  + 5 * 2 * cfg.mfb_factor * cfg.img_feature_channel
                  * o_pad) * batch
            flops += kf
            kernel_note = (
                f" (incl. {kf / 1e12:.3f} TF hand-counted pooled-train-"
                "kernel passes, invisible to XLA cost analysis)"
            )

    print(f"\n=== {cfg.model_name} train-step breakdown @ batch {batch}, "
          f"{cfg.compute_dtype}, rng={args.rng_impl} ===")
    for name, dt in arms.items():
        print(f"  {name:>14}: {dt * 1e3:8.1f} ms  "
              f"({batch / dt:8.0f} qa-pairs/s)")
    if {"full", "fwd", "fwd_bwd", "adam"} <= set(arms):
        bwd_ms = (arms["fwd_bwd"] - arms["fwd"]) * 1e3
        adam_ms = (arms["full"] - arms["fwd_bwd"]) * 1e3
        print(f"  attribution: forward {arms['fwd'] * 1e3:.1f} ms | "
              f"backward {bwd_ms:.1f} ms | "
              f"optimizer(+overlap) {adam_ms:.1f} ms "
              f"(adam alone {arms['adam'] * 1e3:.1f} ms)")
    if {"full", "full_nodrop"} <= set(arms):
        from vqa_attention_networks_tpu.ops import pallas_train_fusion as ptf

        drop_ms = (arms["full"] - arms["full_nodrop"]) * 1e3
        # rate=0 fails the fused train kernel's dispatch gate (supported
        # requires 0<rate<1), so wherever the full arm ran the kernel the
        # nodrop arm ran the composed XLA chain — the delta then measures
        # kernel-vs-composed dispatch (incl. the [N,L,F] f32 residual the
        # kernel exists to remove), NOT what the dropout sites cost.
        switched = (
            cfg.dropout_site == "prepool"
            and cfg.compute_dtype == "bfloat16"
            and cfg.dropout_fusion > 0
            and ptf.supported(batch, cfg.dropout_fusion, cfg.fusion_dim,
                              cfg.mfb_factor)
            and cfg.model_name in ("mfb", "mfb-multilayer", "mhb_coAtt")
        )
        label = ("full-vs-nodrop delta (CAVEAT: nodrop disengages the "
                 "fused train kernel -> composed chain; this is a "
                 "path-switch measurement, not dropout cost)"
                 if switched else
                 "dropout total (masks+residuals, all sites)")
        print(f"  {label}: {drop_ms:.1f} ms "
              f"= {100 * drop_ms / (arms['full'] * 1e3):.0f}% of the step")
    mfu = None
    if flops and "full" in arms:
        mfu = flops / arms["full"] / (PEAK_BF16_TFLOPS * 1e12)
        print(f"  step FLOPs {flops / 1e12:.3f} TF{kernel_note} -> "
              f"train MFU {100 * mfu:.1f}% of {PEAK_BF16_TFLOPS:.0f} "
              f"bf16 TFLOP/s")
    print(json.dumps({
        "arm": "train_breakdown", "model": cfg.model_name, "batch": batch,
        "compute_dtype": cfg.compute_dtype, "rng_impl": args.rng_impl,
        "dropout_site": cfg.dropout_site,
        "ms": {k: round(v * 1e3, 2) for k, v in arms.items()},
        "rng2_impl": rng2_impl,
        "flops_per_step": flops,
        "flops_includes_kernel_handcount": bool(kernel_note),
        "mfu": round(mfu, 4) if mfu else None,
    }), flush=True)


def main(argv=None) -> None:
    import benchmarks.common  # noqa: F401 — runtime preamble
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--model_name", type=str, default="mhb_coAtt")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--rng_impl", type=str, default="threefry2x32")
    parser.add_argument("--dropout_site", type=str, default="prepool",
                        help="prepool = reference semantics (fused train "
                             "kernel); pooled = weight-contracted fast-"
                             "train mode (Config.dropout_site)")
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--breakdown", action="store_true",
                        help="per-stage attribution (forward/backward/"
                             "optimizer/dropout/RNG-impl/remat) + train "
                             "MFU — the training twin of "
                             "bench_flagship_breakdown")
    parser.add_argument("--arms", type=str, default="",
                        help="comma list from %s — each arm is one jit "
                             "compile (~1-3 min over the remote-compile "
                             "relay at batch 1024), so split long runs"
                             % ",".join(ALL_ARMS))
    parser.add_argument("--no_flops", action="store_true",
                        help="skip the cost-analysis recompile; FLOPs/step "
                             "scale linearly in batch, so one cheap CPU "
                             "run pins them (9.665 GFLOP/sample composed)")
    args = parser.parse_args(argv)

    cfg = Config(
        model_name=args.model_name, q_vocab_size=15881, a_vocab_size=1000,
        compute_dtype=args.compute_dtype,
        rng_impl=args.rng_impl,
        dropout_site=args.dropout_site,
    ).validate()
    model = get_model(cfg.model_name)

    if args.breakdown:
        _breakdown(args, cfg, model)
        return

    b = _build(cfg, model, args.rng_impl, args.batch)
    step = b["step"]
    p, o, l = step(b["params"], b["opt_state"], b["img"], b["ques"],
                   b["soft"], b["key"])
    np.asarray(l)
    t0 = time.perf_counter()
    for i in range(args.iters):
        p, o, l = step(p, o, b["img"], b["ques"], b["soft"], b["key"])
    np.asarray(l)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.model_name} train step batch={args.batch} "
          f"rng={args.rng_impl}: {dt * 1000:.1f} ms -> "
          f"{args.batch / dt:.0f} qa-pairs/s")


if __name__ == "__main__":
    main()
