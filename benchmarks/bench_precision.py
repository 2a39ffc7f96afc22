"""Quantify the wq-fusion kernel's precision against the f32 composed path.

Three arms on the flagship (mhb_coAtt) inference forward:

  pallas_bf16   — the default TPU path (VMEM-resident wq kernel, bf16)
  composed_bf16 — the XLA-composed twin at bf16 (VQA_DISABLE_PALLAS=1)
  composed_f32  — the composed path in float32: the accuracy reference

For each bf16 arm vs the f32 reference this reports, per batch of Xavier-
initialised weights and relu-gaussian image features (post-relu, matching
the sign/sparsity profile of real ResNet grid features,
extract_image_features.py:19-26):

  argmax agreement   — fraction of samples whose predicted answer matches
  top-5 overlap      — mean |top5_a ∩ top5_ref| / 5
  max |Δlogit|       — worst absolute logit error
  p99 |Δprob|        — 99th-percentile absolute error on softmax probs

The pallas-vs-composed-bf16 column isolates the KERNEL's contribution from
bf16 quantisation itself. All metrics reduce to scalars inside jit (the
relayed backend makes bulk fetches expensive, see benchmarks/common.py).

TRAINED-WEIGHT MODE (the round-2 verdict's ask): random-weight logits are
far better separated than trained ones, so ``--train_steps N`` first Adam-
trains the model on a FIXED synthetic dataset with annotator-style soft
targets (2-3 plausible answers per sample — converged logits keep close
competitors, i.e. decision boundaries), then measures the arms on that same
trained data. ``--checkpoint DIR`` loads real weights instead.

THE GATE: the kernel's own decision-flip rate (argmax flips of pallas_bf16
vs composed_bf16, isolating the weight-contracted math from bf16 itself)
must stay within FLIP_BUDGET = 0.1% — the BASELINE.md accuracy budget. A
breach exits GATE_BREACH_EXIT (4 — distinct from an ordinary crash's 1)
and the fix is ``--fast_path composed`` (config.py policy). A PASS
requires the one-sided 95% upper bound on the true rate to clear the
budget too; a clean-but-undersized run prints UNDERPOWERED instead.

INTERPRET-MODE PROXY (``--interpret_proxy``, non-TPU backends): opens the
kernel dispatch gates and EXECUTES the kernels in Pallas interpret mode
(``VQA_PALLAS_INTERPRET=1``, ops/pallas_wq_fusion.interpret_proxy). The
kernels' numerics — every bf16 cast and f32 accumulation point is explicit
in the kernel bodies — are reproduced faithfully; the only divergence from
Mosaic-on-TPU is f32 accumulation ORDER inside the dots, orders of
magnitude below the bf16 casts that dominate the kernel-vs-composed gap.
The verdict is labeled PROXY throughout and never substitutes for the
hardware gate (which tools/hw_remeasure.py runs on relay recovery).

Usage: python -m benchmarks.bench_precision [--batch 1024] [--batches 50]
           [--train_steps 300] [--checkpoint models/mhb_coAtt]
           [--interpret_proxy]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model

FLIP_BUDGET = 0.001  # BASELINE.md: accuracy within 0.1% of the reference
# Distinct exit code for a MEASURED gate breach (vs an ordinary crash's
# exit 1): lets tools/hw_remeasure.py's composed-headline contingency fire
# only on real flip-rate evidence.
GATE_BREACH_EXIT = 4


def _metrics(logits_a: jnp.ndarray, logits_ref: jnp.ndarray) -> dict:
    agree = jnp.mean(
        (jnp.argmax(logits_a, -1) == jnp.argmax(logits_ref, -1)).astype(
            jnp.float32
        )
    )
    _, top_a = jax.lax.top_k(logits_a, 5)
    _, top_r = jax.lax.top_k(logits_ref, 5)
    overlap = jnp.mean(
        jnp.sum(
            (top_a[:, :, None] == top_r[:, None, :]).astype(jnp.float32),
            axis=(1, 2),
        )
        / 5.0
    )
    max_dlogit = jnp.max(jnp.abs(logits_a - logits_ref))
    dprob = jnp.abs(
        jax.nn.softmax(logits_a, -1) - jax.nn.softmax(logits_ref, -1)
    )
    p99_dprob = jnp.quantile(dprob.reshape(-1).astype(jnp.float32), 0.99)
    return {
        "argmax_agree": agree,
        "top5_overlap": overlap,
        "max_dlogit": max_dlogit,
        "p99_dprob": p99_dprob,
    }


_compare = jax.jit(_metrics)


def _fixed_batch(cfg, batch: int, idx: int, seed: int = 0):
    """One deterministic synthetic batch with annotator-style soft targets:
    each sample's probability mass is split over 2-3 candidate answers
    (VQA's ten annotators rarely agree unanimously, data_loader.py:39-42),
    so a model trained to convergence keeps close competitors in its
    logits — exactly where argmax flips live.

    Batches are a pure function of (seed, idx), generated on demand:
    materialising the whole dataset was ~1.6 GB/batch of f32 features
    (82 GB at the default 50 measurement batches). Features are stored
    f16 (consumed as bf16/f32 with a cast at the feed)."""
    rng = np.random.default_rng((seed, idx))
    n = batch
    img = np.maximum(
        rng.standard_normal(
            (n, cfg.img_feature_dim, cfg.img_feature_channel), np.float32
        ), 0.0,
    ).astype(np.float16)
    ques = rng.integers(
        0, cfg.q_vocab_size, size=(n, 22)).astype(np.int32)
    qlen = rng.integers(1, 23, size=(n,)).astype(np.int32)
    cands = rng.integers(0, cfg.a_vocab_size, size=(n, 3))
    w = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
    # ~half the samples drop to 2 candidates (mass folded into the first)
    two = rng.random(n) < 0.5
    w[two, 0] += w[two, 2]
    w[two, 2] = 0.0
    soft = np.zeros((n, cfg.a_vocab_size), np.float32)
    np.add.at(soft, (np.arange(n)[:, None], cands), w)
    return img, ques, qlen, soft


def _train_params(model, cfg32, params, train_data, steps: int, batch: int):
    """Adam-train (reference rule: lr 7e-4, soft-CE) on the fixed train
    batches until the weights are trained-like; returns the final params."""
    import optax

    from vqa_attention_networks_tpu.train.losses import soft_cross_entropy

    tx = optax.adam(7e-4)  # solver.py:30
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def step(p, o, k, bi, bq, bl, bs):
        k, k_d = jax.random.split(k)

        def loss_fn(p):
            logits, _ = model.apply(
                # f16->f32 cast on DEVICE: batches stay device-resident
                p, cfg32, bi.astype(jnp.float32), bq, ques_length=bl,
                train=True, rng=k_d,
            )
            return soft_cross_entropy(logits, bs)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, k, loss

    # Ship each train batch through the relay ONCE (f16 image halves the
    # transfer) and keep it device-resident; the old per-step
    # img.astype(np.float32) re-uploaded 1.6 GB every step AND — because
    # nothing in the loop blocked — async dispatch ran hundreds of steps
    # ahead, pinning every in-flight argument buffer in host RAM
    # (observed: +3.5 GB/min RSS on the relayed backend until OOM).
    dev_data = [
        tuple(jax.device_put(a) for a in batch) for batch in train_data
    ]
    for s in range(steps):
        img, ques, qlen, soft = dev_data[s % len(dev_data)]
        params, opt_state, key, loss = step(
            params, opt_state, key, img, ques, qlen, soft
        )
        if (s + 1) % 10 == 0 or s == steps - 1:
            # bound dispatch runahead (and make progress observable)
            loss = float(loss)
        if (s + 1) % 50 == 0 or s == steps - 1:
            print(f"  train step {s + 1}/{steps} loss {loss:.4f}",
                  flush=True)
    return params


def flip_rate_upper_bound(observed_rate: float, n: int) -> float:
    """One-sided 95% upper bound on the true flip rate, so the verdict
    carries its own statistical resolution: zero observed flips over N
    samples only bounds the rate to ~3/N (rule of three) — a PASS at
    N=512 (bound 5.9e-3) is far weaker evidence than a PASS at N=8192
    (bound 3.7e-4 < the 1e-3 budget). Wilson upper bound when flips were
    actually observed."""
    if observed_rate * n < 0.5:
        return 3.0 / n
    z = 1.645
    ph = observed_rate
    return (ph + z * z / (2 * n)
            + z * (ph * (1 - ph) / n + z * z / (4 * n * n)) ** 0.5) \
        / (1 + z * z / n)


def main(argv=None) -> None:
    """CLI entry: restores VQA_PALLAS_INTERPRET afterwards — --interpret_proxy
    sets it mid-run, and leaking it would half-open the kernel dispatch gate
    for any LATER non-proxy call in the same process (observed: a subsequent
    gate run KeyErrors because supported() says dispatched while the kernel
    arms were skipped)."""
    prev = os.environ.get("VQA_PALLAS_INTERPRET")
    try:
        return _main(argv)
    finally:
        if os.environ.get("VQA_PALLAS_INTERPRET") != prev:
            if prev is None:
                os.environ.pop("VQA_PALLAS_INTERPRET", None)
            else:
                os.environ["VQA_PALLAS_INTERPRET"] = prev


def _main(argv=None) -> None:
    import benchmarks.common  # noqa: F401 — runtime preamble
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--batches", type=int, default=50)
    parser.add_argument("--model", type=str, default="mhb_coAtt")
    parser.add_argument("--train_steps", type=int, default=0,
                        help="Adam-train on fixed synthetic soft targets "
                             "first (trained-like weights; the verdict's "
                             "flip-rate methodology)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="orbax weights dir (e.g. models/mhb_coAtt) — "
                             "real trained weights instead of synthetic "
                             "training")
    parser.add_argument("--train_batches", type=int, default=8,
                        help="distinct synthetic train batches kept "
                             "resident under --train_steps; measurement "
                             "batches are generated on demand and held "
                             "out")
    parser.add_argument("--train_batch", type=int, default=None,
                        help="batch size for the TRAINING phase only "
                             "(default: min(--batch, 256)). "
                             "The measurement batch stays --batch: the "
                             "gate needs trained-LIKE weights, not a "
                             "specific train batch, and batch-1024 f32 "
                             "training plus 8 parked 822 MB feature "
                             "batches RESOURCE_EXHAUSTs a 16 GB v5e "
                             "(observed on the r4 hardware remeasure); "
                             "at 256 the parked set is 1.6 GB and the "
                             "f32 step fits with headroom")
    parser.add_argument("--q_vocab", type=int, default=15881)
    parser.add_argument("--a_vocab", type=int, default=1000)
    parser.add_argument("--interpret_proxy", action="store_true",
                        help="off-TPU: execute the kernel arms in Pallas "
                             "interpret mode (dtype-faithful kernel "
                             "numerics; MXU accumulation order not "
                             "reproduced) — a labeled PROXY for the "
                             "hardware flip-rate gate, not a substitute")
    parser.add_argument("--int8_feed", action="store_true",
                        help="also measure the int8 quantized-store feed's "
                             "argmax flip rate vs the f32 feed (runs on "
                             "any backend — the dequant is plain XLA)")
    args = parser.parse_args(argv)
    if args.train_batch is None:
        args.train_batch = min(args.batch, 256)

    model = get_model(args.model)
    cfg16 = Config(
        model_name=args.model, q_vocab_size=args.q_vocab,
        a_vocab_size=args.a_vocab, compute_dtype="bfloat16",
    ).validate()
    cfg32 = cfg16.replace(compute_dtype="float32")
    params = jax.device_put(model.init(jax.random.PRNGKey(0), cfg16))

    trained = False
    if args.checkpoint:
        from vqa_attention_networks_tpu.utils import checkpoint as ckpt

        params = ckpt.load_weights(args.checkpoint, params)
        print(f"loaded trained weights from {args.checkpoint}")
        trained = True
    elif args.train_steps:
        # train batches keep the low idx range (0..train_batches); the
        # measurement loop draws from 10_000+b — disjoint by construction
        train_data = [
            _fixed_batch(cfg16, args.train_batch, i)
            for i in range(args.train_batches)
        ]
        print(f"training {args.train_steps} steps on the fixed synthetic "
              f"dataset ({args.train_batches}x{args.train_batch} "
              f"samples)...")
        params = _train_params(
            model, cfg32, params, train_data, args.train_steps,
            args.train_batch,
        )
        del train_data
        trained = True

    def fwd(cfg):
        def run(p, img, ques, qlen):
            logits, _ = model.apply(
                p, cfg, img, ques, ques_length=qlen, train=False
            )
            return logits.astype(jnp.float32)

        return jax.jit(run)

    # dispatch is decided at trace time (pallas_wq_fusion.supported reads the
    # env var and the img dtype), so trace the pallas arm FIRST, then flip
    # the kill switch for the composed-bf16 arm
    assert not os.environ.get("VQA_DISABLE_PALLAS"), (
        "unset VQA_DISABLE_PALLAS — this benchmark traces both settings"
    )
    # off-TPU the kernel dispatch gate is closed, so the "pallas" arm would
    # silently trace the composed path and report a meaningless 0-flip
    # kernel gate — drop the kernel arms instead of mislabeling them (the
    # bf16-vs-f32 and int8-feed arms remain valid accuracy evidence on CPU)
    proxy = False
    if args.interpret_proxy:
        if jax.default_backend() == "tpu":
            print("--interpret_proxy ignored: backend IS TPU, the real "
                  "kernels run (the binding gate)")
        else:
            os.environ["VQA_PALLAS_INTERPRET"] = "1"
            proxy = True
            print("INTERPRET-MODE PROXY: kernel arms execute in Pallas "
                  "interpret mode on this backend — dtype-faithful kernel "
                  "numerics, MXU accumulation order NOT reproduced; the "
                  "verdict below is a PROXY for the hardware gate")
    kernel_arm = jax.default_backend() == "tpu" or proxy
    if not kernel_arm:
        print("backend is not TPU: kernel arms skipped "
              "(composed_bf16 / int8_feed arms only); pass "
              "--interpret_proxy for the labeled interpret-mode proxy")
    fwd_pallas = fwd(cfg16) if kernel_arm else None
    fwd_f32 = fwd(cfg32)

    accum: dict = {}
    for b in range(args.batches):
        if trained and not args.checkpoint:
            # measure on HELD-OUT samples of the trained distribution:
            # the trained weights keep the dirichlet candidates' logits
            # close, the regime where flips change accuracy (fresh batch
            # indices — disjoint from the train batches by construction)
            img_host, ques_np, qlen_np, _ = _fixed_batch(
                cfg16, args.batch, 10_000 + b
            )
            img16 = jnp.asarray(img_host, jnp.bfloat16)
            ques = jnp.asarray(ques_np)
            qlen = jnp.asarray(qlen_np)
        else:
            img_host = None
            rng = jax.random.PRNGKey(100 + b)
            k_i, k_q, k_l = jax.random.split(rng, 3)
            # post-relu gaussian: real grid features are relu outputs
            img16 = jax.nn.relu(
                jax.random.normal(
                    k_i, (args.batch, cfg16.img_feature_dim,
                          cfg16.img_feature_channel), jnp.bfloat16,
                )
            )
            ques = jax.random.randint(
                k_q, (args.batch, 22), 0, cfg16.q_vocab_size, jnp.int32
            )
            qlen = jax.random.randint(k_l, (args.batch,), 1, 23, jnp.int32)

        logits_pallas = (fwd_pallas(params, img16, ques, qlen)
                         if kernel_arm else None)
        logits_f32 = fwd_f32(params, img16.astype(jnp.float32), ques, qlen)

        logits_int8 = None
        if args.int8_feed:
            # the int8 quantized-store feed: THE writer's quantization
            # (feature_store.quantize_features — shared, so this arm can
            # never measure a scheme the store no longer produces), then
            # the on-device dequant — measured against the f32 arm with
            # the same flip-rate methodology as the kernel gate
            from vqa_attention_networks_tpu.data.feature_store import (
                quantize_features,
            )

            # quantize from the host copy when one exists — np.asarray on a
            # relayed device array round-trips 1.6 GB/batch through the relay
            src = (img_host.astype(np.float32) if img_host is not None
                   else np.asarray(img16, np.float32))
            qrows, scale, _ = quantize_features(src)
            dt = jnp.bfloat16
            img_deq = (jnp.asarray(qrows).astype(dt)
                       * jnp.asarray(scale)[:, None, :].astype(dt))
            logits_int8 = fwd_f32(
                params, img_deq.astype(jnp.float32), ques, qlen
            )

        os.environ["VQA_DISABLE_PALLAS"] = "1"
        try:
            if b == 0:
                fwd_comp16 = fwd(cfg16)  # fresh trace under the kill switch
            logits_comp16 = fwd_comp16(params, img16, ques, qlen)
        finally:
            del os.environ["VQA_DISABLE_PALLAS"]

        comparisons = {
            "composed_bf16 vs composed_f32": (logits_comp16, logits_f32),
        }
        if kernel_arm:
            comparisons["pallas_bf16 vs composed_f32"] = (
                logits_pallas, logits_f32
            )
            comparisons["pallas_bf16 vs composed_bf16"] = (
                logits_pallas, logits_comp16
            )
        if logits_int8 is not None:
            comparisons["int8_feed_f32 vs composed_f32"] = (
                logits_int8, logits_f32
            )
        for name, (a, r) in comparisons.items():
            m = {k: float(v) for k, v in _compare(a, r).items()}
            acc = accum.setdefault(
                name,
                {"argmax_agree": [], "top5_overlap": [], "max_dlogit": [],
                 "p99_dprob": []},
            )
            for k, v in m.items():
                acc[k].append(v)
        print(f"batch {b + 1}/{args.batches} done", flush=True)

    wmode = ("trained checkpoint" if args.checkpoint
             else f"{args.train_steps}-step-trained weights on fixed data"
             if args.train_steps else
             "Xavier weights / relu-gaussian features")
    print(f"\n{args.model} @ batch {args.batch}, "
          f"{args.batches} batches, {wmode}")
    header = (f"{'comparison':34s} {'argmax':>8s} {'top5':>8s} "
              f"{'max|Δlogit|':>12s} {'p99|Δprob|':>11s}")
    print(header)
    for name, acc in accum.items():
        print(
            f"{name:34s} "
            f"{np.mean(acc['argmax_agree']):8.4f} "
            f"{np.mean(acc['top5_overlap']):8.4f} "
            f"{np.max(acc['max_dlogit']):12.2e} "
            f"{np.max(acc['p99_dprob']):11.2e}",
            flush=True,
        )

    # ---- the gate (round-2 verdict #3) ------------------------------------
    from vqa_attention_networks_tpu.ops import pallas_wq_fusion as wqf

    dispatched = wqf.supported(
        img16, params["img_conv1d"]["w"], cfg16.mfb_factor
    ) if args.model == "mhb_coAtt" else False
    if not dispatched:
        print("\nwq kernel NOT dispatched on this backend/shape — the flip-"
              "rate gate is vacuous here; run on TPU for the real verdict")
        return
    kernel_flip = 1.0 - float(np.mean(
        accum["pallas_bf16 vs composed_bf16"]["argmax_agree"]
    ))
    total_flip = 1.0 - float(np.mean(
        accum["pallas_bf16 vs composed_f32"]["argmax_agree"]
    ))
    weights = (f"checkpoint {args.checkpoint}" if args.checkpoint else
               f"{args.train_steps}-step trained" if args.train_steps else
               "RANDOM (pass --train_steps for the binding verdict)")
    tag = (", INTERPRET-MODE PROXY — not the hardware verdict" if proxy
           else "")
    print(f"\nflip-rate gate ({weights} weights, "
          f"{args.batches * args.batch} samples{tag}):")
    print(f"  kernel flips vs composed bf16: {kernel_flip:.5f}"
          f"  (budget {FLIP_BUDGET})")
    n_samples = args.batches * args.batch
    upper = flip_rate_upper_bound(kernel_flip, n_samples)
    print(f"  95% upper bound on the true kernel flip rate: {upper:.5f} "
          f"(N={n_samples})")
    print(f"  total  flips vs composed f32:  {total_flip:.5f}")
    # Three-way verdict, bound-aware: a PASS must mean the EVIDENCE bounds
    # the true rate under budget, not merely that no flip happened in a
    # sample too small to see one. The PROXY tag rides the verdict line
    # itself, not only the header: scripts that grep for the verdict must
    # never record an unqualified policy decision from non-hardware
    # numbers. Gate breach exits with a DISTINCT code (4) so callers
    # (tools/hw_remeasure.py contingency) can tell a measured breach from
    # an ordinary crash's exit 1.
    tagp = "PROXY-" if proxy else ""
    if kernel_flip > FLIP_BUDGET:
        print(f"  {tagp}FAIL — serve with --fast_path composed until the "
              "kernel is fixed (config.py fast_path policy)")
        sys.exit(GATE_BREACH_EXIT)
    elif upper <= FLIP_BUDGET:
        print(f"  {tagp}PASS — fast_path='auto' keeps the kernel default-on"
              + (" (pending the hardware gate)" if proxy else ""))
    else:
        need = int(np.ceil(3.0 / FLIP_BUDGET))
        print(f"  {tagp}UNDERPOWERED — observed rate {kernel_flip:.5f} is "
              f"within budget, but N={n_samples} bounds the true rate only "
              f"to {upper:.5f} > {FLIP_BUDGET}; not a binding PASS "
              f"(need N >= {need})")


if __name__ == "__main__":
    main()
