"""Frozen run configuration.

The reference keeps a module-level mutable ``easydict`` that entry points
monkey-patch at runtime (reference ``cfg.py:3-34``, ``train_models.py:24-38``).
Here the whole run configuration is a single frozen dataclass constructed once
from the CLI / a file; models receive it by value and nothing mutates it.

Defaults mirror the reference's (``cfg.py``): hidden 1024, emb 300, lr 7e-4,
batch 64, 18 epochs, lr decay x0.5 every 40k steps, ResNet-152 grid 196x2048.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

MODEL_NAMES = (
    "mfb",
    "mfb-multilayer",
    "mhb",
    "mhb_coAtt",
    "hieCoAtten",
    "visLstm",
    "iBOWIMG",
    "attentionNet",
)

# Models trained with soft answer distributions + soft cross-entropy
# (reference forces soft_answer=1 for mhb*: train_models.py:30-33 and picks
# KLDivLoss for them: solver.py:26-29).
SOFT_ANSWER_MODELS = ("mhb", "mhb_coAtt")


@dataclass(frozen=True)
class Config:
    # --- model selection -------------------------------------------------
    model_name: str = "mhb_coAtt"

    # --- vocab sizes (filled from the prepared dataset, mirroring
    # train_models.py:37-38) ----------------------------------------------
    q_vocab_size: int = 15881
    a_vocab_size: int = 1000

    # --- network (cfg.py:9-14) -------------------------------------------
    hidden_dim: int = 1024
    emb_dim: int = 300
    num_layers: int = 1
    glove: bool = False

    # MFB/MHB bilinear-fusion factorisation: k * o = 5000, k = 5
    # (reference mfb.py:41-43, mhb_coAtt.py:43-45).
    mfb_factor: int = 5
    mfb_out: int = 1000

    # hieCoAtten / iBOWIMG / attentionNet embed width
    # (reference hieCoAtten.py:6, networks.py:8,31).
    embed_size: int = 512
    att_num: int = 6

    # --- image features (cfg.py:24-28) -------------------------------------
    img_feature_channel: int = 2048
    img_feature_dim: int = 196  # 14*14 regions
    feature_type: str = "resnet152"
    max_question_length: int = 22
    image_first: bool = True

    # --- training (cfg.py:16-23) -------------------------------------------
    batch_size: int = 64
    lr: float = 7e-4
    num_epoch: int = 18
    lr_decay: bool = True
    decay_rate: float = 0.5
    decay_step: int = 40000
    shuffle: bool = True
    early_stopping: bool = False
    patience: int = 10  # solver.py:45
    seed: int = 0
    # host batch-assembly threads (the counterpart of the reference's 4
    # DataLoader worker processes, cfg.py:6): the gather/densify hot path is
    # GIL-free C (native/dataplane.cpp), so threads scale on a multi-core
    # TPU-VM host. 1 = single-producer prefetch thread (old behaviour).
    prefetch_workers: int = 4

    # dropout rates (mfb.py:32,44; mhb_coAtt.py:38,46; visLstm/networks use
    # F.dropout's default 0.5)
    dropout_lstm: float = 0.3
    dropout_fusion: float = 0.1
    dropout_default: float = 0.5

    # WHERE the grid-fusion dropout lands (mfb/mhb_coAtt training):
    #   "prepool" — the reference's site (mfb.py:99, mhb_coAtt.py:101): the
    #               mask lives on the [N, 196, 5000] pre-pool product, which
    #               forces training to compute the full O*k-wide fusion
    #               (~16 GFLOP/sample fwd+bwd at production dims; the fused
    #               Pallas train kernel keeps it HBM-free but not FLOP-free).
    #   "pooled"  — TPU-first fast-train mode: dropout on the POOLED fusion
    #               output [N, 196, 1000] instead, which frees training to
    #               use the same weight-contracted formulation inference
    #               runs (~2.5 GFLOP/sample fwd+bwd — see ops/fusion.py
    #               grid_fuse_pooled). Different regularizer (whole pooled
    #               units drop instead of 1/k factors), so NOT
    #               accuracy-parity with the reference recipe; the
    #               convergence soak (tools/soak.py --dropout_site pooled)
    #               gates that it trains to the same quality.
    dropout_site: str = "prepool"

    # --- numerics ----------------------------------------------------------
    # Parameters are kept in float32; compute_dtype applies to activations on
    # the forward path (bf16 keeps the MXU fed at full rate on TPU).
    compute_dtype: str = "float32"

    # Split each optimizer step into this many sequential microbatches
    # (lax.scan): peak activation memory is one microbatch's; gradients
    # average uniformly across microbatches. Composes with remat. Must
    # divide batch_size.
    grad_accum_steps: int = 1

    # Rematerialise the forward pass during backward (jax.checkpoint): trades
    # one extra forward's FLOPs for dropping every intermediate activation
    # from HBM — the standard lever when a bigger train batch OOMs. Gradients
    # are bit-identical (tests/test_solver.py::test_remat_gradients_match).
    remat: bool = False

    # PRNG implementation for training randomness (dropout). "threefry" is
    # JAX's reproducible default; "rbg" is hardware-accelerated on TPU —
    # the fusion-site dropout draws ~1M bits/sample, ~30% of the train step
    # under threefry.
    rng_impl: str = "threefry2x32"

    # --- bf16 inference fast-path policy -------------------------------------
    # Dispatch of the VMEM-resident wq kernel (ops/pallas_wq_fusion.py) on the
    # bf16 eval forward:
    #   "auto"     — kernel when supported (TPU, bf16, lane-aligned shapes);
    #                the PAIR variant on even batches (promoted r4: the
    #                hardware A/B measured pair faster on both the headline
    #                — 60,964 vs 59,814 qa-pairs/s, bench.py — and the
    #                micro — 69,418 vs 68,146, bench_wq_kernel; bit-exact
    #                vs the single-sample kernel). The weight-contracted
    #                formulation admits ~p99 5% relative logit error vs the
    #                f32 composed chain under signed-sqrt (ops/fusion.py);
    #                "auto" is correct while the measured argmax FLIP RATE
    #                vs the composed bf16 path stays within the 0.1%
    #                accuracy budget (BASELINE.md). bench_precision
    #                --train_steps N measures and GATES exactly this.
    #   "composed" — always the XLA-composed chain (the accuracy reference at
    #                this dtype): the fallback whenever a measured flip rate
    #                exceeds the budget on real trained weights.
    #   "pallas"   — force the SINGLE-sample kernel (still requires
    #                supported() shapes); the A/B control arm.
    #   "pallas_pair" — force the two-samples-per-instance kernel variant
    #                (ops/pallas_wq_fusion.py fused_stage1_coattention_
    #                pallas_pair): interleaves two samples' VPU/MXU phases
    #                per grid instance so the scheduler can overlap them.
    #                Bit-exact vs "pallas"; odd SPMD shards fall back to
    #                the single kernel inside the partitioned twin.
    # VQA_DISABLE_PALLAS=1 remains the process-wide emergency kill switch.
    fast_path: str = "auto"

    # --- training feed policy -------------------------------------------------
    # Device-resident feature bank for training/eval: the Solver uploads the
    # ENTIRE feature store to HBM once at init and ships only per-batch row
    # indices; the feature gather (+ int8 dequant) happens in-graph. Zero
    # feature bytes per step on the host->device link — the training twin of
    # serving's DeviceFeatureCache (serve.py), for the common case where the
    # deduplicated image set fits in HBM (VQA-v2 train is ~83k images; int8 at
    # 196x2048 = ~33 GB, too big for one v5e chip — but the convergence soak's
    # 512 images are 205 MB, and multi-chip meshes can afford more). The
    # Solver enforces a byte budget and raises with sizing guidance when the
    # store doesn't fit. Bit-identical to the host feed: the bank stores the
    # same bytes the host would ship (int8 rows + f16 scales, or f16 rows)
    # and applies the same on-device dequant.
    device_feature_bank: bool = False
    # HBM byte budget for the bank, PER DEVICE (leave headroom for
    # params/activations).
    device_feature_bank_budget: int = 8 << 30
    # Shard the bank's rows over the 'data' mesh axis instead of
    # replicating it on every device. Replicated cost is store_bytes x
    # n_devices across the mesh; sharded cost is store_bytes / n_data PER
    # DEVICE, so effective bank capacity scales with the mesh (VQA-v2
    # train int8 at ~33 GB fits a 4-chip data axis that replication never
    # could). The in-graph gather becomes a ring exchange over ICI
    # (lax.ppermute): each device's (indices, accumulator) visits every
    # table shard once — peak temporary is one PER-DEVICE batch slice, and
    # the bytes move over ICI instead of the host link. Bit-identical to
    # the replicated bank and the host feed: each row is dequantised by
    # exactly one owner with the same expression, and every other ring
    # stop leaves it untouched (tests/test_device_bank_train.py).
    device_feature_bank_shard: bool = False

    # --- reference-bug policy ----------------------------------------------
    # The reference carries live bugs whose "fixed" semantics are the evident
    # intent (SURVEY.md section 2). We implement the fixed semantics and record
    # each deviation in the model docstrings:
    #   * mhb_coAtt.py:214   `linear_out(mhb_22)` -> mhb_12 (NameError otherwise)
    #   * hieCoAtten.py:31   fc_Wbv used for the question branch -> fc_Wbq
    #   * hieCoAtten.py:52   torch.cat(dim=0)+view scrambles samples -> dim=1
    #   * networks.py:64     same dim-0 concat bug -> dim=1
    #   * mhb_coAtt.py:72-74 batch_first LSTM fed [T,N,H] scans across the
    #     batch; we scan over time.
    # The *quirks* that are semantically valid (MFB's softmax over a singleton
    # axis, mfb.py:84,118; LSTM_Attention's unnormalised attention,
    # visLstm.py:91-97) are replicated exactly unless this flag is False.
    keep_reference_quirks: bool = True

    # --- parallelism ---------------------------------------------------------
    # Mesh axis sizes; data * model must equal the device count in use.
    data_parallel: int = 1
    model_parallel: int = 1

    # --- paths (cfg.py:33-34) -----------------------------------------------
    data_dir: str = "data"
    out_dir: str = "./models"
    results_dir: str = "./results"

    # --- run mode -------------------------------------------------------------
    mode: str = "training"  # training | testing (train_models.py:20)

    # --- legacy-trainer knobs (train_hfd.py capability, SURVEY C22) ---------
    # loss_override: None = reference selection (soft-CE for mhb*, CE else,
    # solver.py:26-29); "soft_bce" = the legacy trainer's soft BCE loss
    # (train_hfd.py:69-72).
    loss_override: str = ""
    # early-stopping metric: "loss" (solver.py:160-172, patience 10) or
    # "acc" (train_hfd.py:154-166, patience 5 on val accuracy).
    early_stop_metric: str = "loss"

    # --- aux subsystems (SURVEY section 5) ----------------------------------
    # enable jax.debug_nans behind a flag (race/sanitizer analog)
    debug_nans: bool = False
    # write a jax.profiler trace for the first N steps of each run (0 = off)
    profile_steps: int = 0
    profile_dir: str = "runs/profile"

    # checkpointing cadence (capability upgrade over the reference's
    # save-at-end-only, solver.py:184-190)
    checkpoint_every_steps: int = 2000
    # retain only the newest N resume checkpoints (0 = keep all); the final
    # save is always the newest so it survives, and the weights-only export
    # lives outside the step_* retention scheme entirely
    keep_checkpoints: int = 3

    @property
    def soft_answer(self) -> bool:
        # soft_bce (the legacy trainer's loss, train_hfd.py:69-72) consumes
        # soft targets regardless of model — without this the pipeline would
        # feed it the [B,1] zero placeholder and train a nonsense objective
        return (
            self.model_name in SOFT_ANSWER_MODELS
            or self.loss_override == "soft_bce"
        )

    @property
    def fusion_dim(self) -> int:
        return self.mfb_factor * self.mfb_out  # 5000

    @property
    def lstm_input_dim(self) -> int:
        # GloVe concat doubles the LSTM input (mhb_coAtt.py:27-31).
        return self.emb_dim * 2 if self.glove else self.emb_dim

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def validate(self) -> "Config":
        if self.model_name not in MODEL_NAMES:
            raise ValueError(
                f"model {self.model_name!r} not supported; choose from {MODEL_NAMES}"
            )
        if self.fusion_dim != 5000:
            # The factorisation is a free parameter here (the reference
            # hard-codes 5000 = 5*1000); any k*o is allowed.
            pass
        if self.img_feature_dim != 196:
            raise ValueError("img_feature_dim must be 196 (14x14 ResNet grid)")
        if self.model_name == "attentionNet" and self.att_num < 2:
            raise ValueError(
                f"att_num={self.att_num}: attentionNet needs >= 2 "
                "alternating layers (one per guiding direction, "
                "networks.py:58-62)"
            )
        if self.grad_accum_steps < 1 or (
            self.batch_size % self.grad_accum_steps
        ):
            raise ValueError(
                f"grad_accum_steps={self.grad_accum_steps} must be >=1 and "
                f"divide batch_size={self.batch_size}"
            )
        if self.prefetch_workers < 1:
            raise ValueError(
                f"prefetch_workers={self.prefetch_workers} must be >= 1"
            )
        for field, value, allowed in (
            ("early_stop_metric", self.early_stop_metric, ("loss", "acc")),
            ("mode", self.mode, ("training", "testing")),
            ("compute_dtype", self.compute_dtype,
             ("float32", "float64", "bfloat16")),
            ("rng_impl", self.rng_impl, ("threefry2x32", "rbg")),
            ("loss_override", self.loss_override, ("", "soft_bce")),
            ("fast_path", self.fast_path,
             ("auto", "pallas", "pallas_pair", "composed")),
            ("dropout_site", self.dropout_site, ("prepool", "pooled")),
        ):
            if value not in allowed:
                raise ValueError(
                    f"{field}={value!r} not supported; choose from {allowed}"
                )
        return self
