"""Solver: pjit-compiled train/val/save driver.

Capability twin of the reference ``Solver`` (solver.py:16-190), redesigned for
TPU:

- ONE compiled train step (loss -> grad -> Adam -> metric) over a
  ``('data','model')`` mesh; batches are sharded over 'data', the wide fusion
  projections over 'model', and XLA inserts all collectives — the reference's
  ``nn.DataParallel`` scatter/gather (solver.py:34-37) has no hand-written
  counterpart here.
- Loss selection mirrors solver.py:26-29 (soft cross-entropy == KLDiv for the
  soft-answer models, CE otherwise); Adam(lr=7e-4) with the x0.5/40k-step
  staircase decay (cfg.py:21-23, solver.py:47-50,104-105).
- Per-epoch "training-mode" validation evaluates a single batch, exactly like
  the reference (solver.py:154-156); ``val(full=True)`` sweeps the split and
  emits ``results/<model>.txt`` in the reference's format (solver.py:179-182)
  plus top-3 accuracy (the metric the TF eval script defines,
  evaluate_tf.py:69-76).
- Early stopping: patience on val loss (solver.py:42-45,160-172).
- Orbax checkpoints of {params, opt_state, step} every N steps — a
  capability upgrade over the reference's save-at-end-only
  (solver.py:184-190).
- Static shapes everywhere: the final partial batch is padded and masked, so
  the step compiles once. The reference's accuracy denominator counts pad
  rows as full rows (solver.py:177); both the exact and the
  reference-compatible numbers are reported.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.data.dataset import Batch, VqaBatches, prefetch
from vqa_attention_networks_tpu.data.feature_store import FeatureStore
from vqa_attention_networks_tpu.data.prepare import ANSWER_TYPE_NAMES, QAData
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from vqa_attention_networks_tpu.train.losses import (
    correct_count,
    cross_entropy,
    soft_bce,
    soft_cross_entropy,
    topk_correct_count,
    vqa_consensus_scores,
)
from vqa_attention_networks_tpu.utils import checkpoint as ckpt
from vqa_attention_networks_tpu.parallel.distributed import (
    host_fetch,
    is_primary,
)
from vqa_attention_networks_tpu.utils.logging import MetricWriter, NullMetricWriter
from vqa_attention_networks_tpu.utils.timer import Timer


BN_MOMENTUM = 0.1  # torch nn.BatchNorm1d default (networks.py:11,44)


def _merge_batch_stats(
    params: Dict[str, Any],
    aux: Dict[str, Any],
    micro_valid: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    """EMA this step's batch-norm batch statistics into the running stats.

    The layers return RAW batch stats (models/layers.py batchnorm); the
    momentum update lives here. ``aux["batch_stats"]`` leaves may carry a
    leading microbatch axis (grad accumulation's lax.scan stacks them) —
    then the EMA applies sequentially per microbatch, matching torch's
    once-per-forward momentum semantics. ``micro_valid`` ([a] valid-row
    counts) skips microbatches that are ENTIRELY padding (slices of the
    epoch's padded final batch): their masked stats are mean=0/var=0, and
    EMAing those zeros would shrink the running stats toward 0 right
    before the epoch's val() reads them."""
    stats = aux.get("batch_stats")
    if not stats:
        return params
    params = dict(params)
    for layer, new in stats.items():
        merged = dict(params[layer])
        for key, batch in new.items():
            run = merged[key]
            if batch.ndim == run.ndim + 1:  # stacked microbatch stats
                for i in range(batch.shape[0]):
                    upd = (1 - BN_MOMENTUM) * run + BN_MOMENTUM * batch[i]
                    if micro_valid is not None:
                        upd = jnp.where(micro_valid[i] > 0, upd, run)
                    run = upd
            else:
                run = (1 - BN_MOMENTUM) * run + BN_MOMENTUM * batch
            merged[key] = run
        params[layer] = merged
    return params


class Solver:
    def __init__(
        self,
        cfg: Config,
        qa_data: QAData,
        store: FeatureStore,
        glove_table: Optional[np.ndarray] = None,
        mesh=None,
        log_dir: str = "runs",
    ):
        cfg.validate()
        self.cfg = cfg
        if cfg.debug_nans:
            # sanitizer analog (SURVEY section 5): trap NaNs at the op level
            jax.config.update("jax_debug_nans", True)
        self.model = get_model(cfg.model_name)
        if mesh is None:
            if cfg.data_parallel > 1:
                # honour an explicitly requested layout (config.py:126)
                if cfg.batch_size % cfg.data_parallel:
                    raise ValueError(
                        f"batch_size={cfg.batch_size} not divisible by "
                        f"data_parallel={cfg.data_parallel}"
                    )
                data = cfg.data_parallel
            else:
                # default mesh: all devices, shrinking the data axis until
                # it divides the (static) batch size
                data = len(jax.devices()) // cfg.model_parallel
                while data > 1 and cfg.batch_size % data != 0:
                    data -= 1
            mesh = make_mesh(data=data, model=cfg.model_parallel)
        self.mesh = mesh
        # multi-process runs: only the primary host writes metrics/results
        # (the scalars are replicated — every host computes the same values)
        self.writer = (
            MetricWriter(log_dir, run_name=cfg.model_name)
            if is_primary() else NullMetricWriter()
        )
        self.step = 0

        # params (xavier init, train_models.py:54-56) sharded onto the mesh
        rng = jax.random.PRNGKey(cfg.seed)
        if cfg.model_name == "mhb_coAtt" and cfg.glove:
            params = self.model.init(rng, cfg, glove_table=glove_table)
        else:
            params = self.model.init(rng, cfg)
        self.params = shard_params(self.mesh, params, cfg.fusion_dim)

        # Adam + staircase decay (solver.py:30,47-50; cfg.py:21-23)
        if cfg.lr_decay:
            schedule = optax.exponential_decay(
                cfg.lr, cfg.decay_step, cfg.decay_rate, staircase=True
            )
        else:
            schedule = cfg.lr
        self.tx = optax.adam(schedule)
        # jitted init with EXPLICIT moment shardings: each adam moment gets
        # its param's sharding (TP fusion weights keep their 'model' split)
        # and scalars (count) replicate over the mesh. Left to the
        # compiler, replicated-input outputs collapse onto device 0 —
        # wrong placement on a mesh. Jitted (not device_put) so it also
        # works on multi-process meshes where remote shards are
        # non-addressable (caught by test_multiprocess.py).
        from jax.sharding import NamedSharding, PartitionSpec as P

        p_shardings = param_shardings(self.mesh, self.params, cfg.fusion_dim)
        opt_shardings = optax.tree_map_params(
            self.tx,
            lambda _, s: s,
            jax.eval_shape(self.tx.init, self.params),
            p_shardings,
            transform_non_params=lambda _: NamedSharding(self.mesh, P()),
        )
        self.opt_state = jax.jit(
            self.tx.init, out_shardings=opt_shardings
        )(self.params)

        # data pipelines (the counterpart of solver.py:39-41). With a bf16
        # compute dtype the features ship as f16 (same store dtype) and the
        # model casts on device — half the host->device traffic.
        if getattr(store, "quantized", False):
            # int8 store: ship (int8 rows, f16 scales) and dequantise on
            # device — 4x less H2D traffic than the f32 feed; the scales
            # keep per-channel relative error ~1/254
            feature_dtype = np.int8
        else:
            feature_dtype = (
                np.float16 if cfg.compute_dtype == "bfloat16" else np.float32
            )
        out_dt = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        self._dequant = jax.jit(
            lambda q, s: q.astype(out_dt) * s[:, None, :].astype(out_dt)
        )
        # Device feature bank (Config.device_feature_bank): the whole store
        # lives in HBM, batches carry row indices, the gather (+ dequant) is
        # in-graph — zero feature bytes per step on the host->device link.
        # The training twin of serving's DeviceFeatureCache (serve.py); the
        # enabler for compute-bound TPU soaks behind a slow relay link
        # (docs/OPERATIONS.md: effective H2D ~23 MB/s makes the per-step
        # 50-200 MB feature upload the wall).
        self._bank = None
        if cfg.device_feature_bank:
            self._bank = self._build_feature_bank(store, out_dt)
        self.batches = {
            split: VqaBatches(
                getattr(qa_data, split),
                store,
                batch_size=cfg.batch_size,
                num_answers=cfg.a_vocab_size,
                soft_answer=cfg.soft_answer,
                shuffle=(cfg.shuffle and split == "train"),
                seed=cfg.seed,
                feature_dtype=feature_dtype,
                device_bank=self._bank is not None,
            )
            for split in ("train", "val")
        }

        # per-step dropout keys are fold_in(base, step): deterministic and
        # resume-exact (no mutable RNG state to checkpoint)
        self._rng_base = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)
        self._train_step = jax.jit(self._train_step_fn, donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_fn)

        # inverse answer vocab, for the official leaderboard-submission
        # predictions export ({"question_id", "answer"} rows in val(full=True))
        self._answer_words = {
            idx: word for word, idx in qa_data.answer_vocab.items()
        }
        # code -> question-type name, for the perQuestionType breakdown
        self._question_type_names = qa_data.question_type_names

        # early stopping state (solver.py:42-45)
        self.min_val_loss = float("inf")
        self.best_val_acc = -1.0
        self.i_patience = 0
        self.best_params = None

    # ------------------------------------------------------------------
    # compiled steps
    # ------------------------------------------------------------------

    def _loss(self, logits, batch_answers, soft, valid):
        # loss selection: solver.py:26-29, with the legacy trainer's soft-BCE
        # (train_hfd.py:69-72) available via cfg.loss_override
        if self.cfg.loss_override == "soft_bce":
            return soft_bce(logits, soft, valid)
        if self.cfg.soft_answer:
            return soft_cross_entropy(logits, soft, valid)
        return cross_entropy(logits, batch_answers, valid)

    def _labels(self, answers, soft):
        # soft-answer models score against the argmax'd distribution
        # (solver.py:99-101,150-151)
        return jnp.argmax(soft, axis=-1) if self.cfg.soft_answer else answers

    def _train_step_fn(self, params, opt_state, img, ques, answers, qlen,
                       valid, soft, rng):
        def apply(p, img, ques, qlen, rng, valid):
            return self.model.apply(
                p, self.cfg, img, ques, ques_length=qlen, train=True,
                rng=rng, valid=valid,
            )

        if self.cfg.remat:
            # recompute the forward during backward instead of keeping every
            # intermediate in HBM; same gradients, smaller peak memory
            apply = jax.checkpoint(apply)

        def grad_one(mimg, mques, mans, mqlen, mvalid, msoft, mrng):
            def loss_fn(p):
                logits, aux = apply(p, mimg, mques, mqlen, mrng, mvalid)
                return (
                    self._loss(logits, mans, msoft, mvalid), (logits, aux)
                )

            (loss, (logits, aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            correct = correct_count(logits, self._labels(mans, msoft), mvalid)
            return loss, grads, aux, correct

        a = self.cfg.grad_accum_steps
        if a > 1:
            # microbatch accumulation (lax.scan): peak activation memory is
            # one microbatch's; grads/losses average uniformly over the a
            # microbatches (exact whenever their valid counts are equal —
            # i.e. every batch except a padded final one), dropout keys are
            # fold_in(rng, i). BN normalises per microbatch; the stacked
            # batch stats are EMA'd sequentially by _merge_batch_stats
            # (one momentum application per microbatch, torch semantics).
            n_micro = img.shape[0] // a

            def re(x):
                return x.reshape(a, n_micro, *x.shape[1:])

            xs = tuple(re(x) for x in (img, ques, answers, qlen, valid, soft))

            def body(carry, x):
                i, loss_s, grads_s, correct_s = carry
                loss, grads, aux, correct = grad_one(
                    *x, jax.random.fold_in(rng, i)
                )
                grads_s = jax.tree_util.tree_map(
                    jnp.add, grads_s, grads
                )
                return (i + 1, loss_s + loss, grads_s, correct_s + correct), aux

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            init = (
                jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.float32),
                zero_grads,
                jnp.zeros((), jnp.float32),
            )
            (_, loss, grads, correct), auxes = jax.lax.scan(body, init, xs)
            loss = loss / a
            grads = jax.tree_util.tree_map(lambda g: g / a, grads)
            aux = jax.tree_util.tree_map(lambda s: s[-1], auxes)
            micro_valid = None
            if auxes.get("batch_stats"):
                # keep the microbatch axis: the merge EMAs sequentially,
                # skipping all-pad microbatches via the per-micro counts
                aux["batch_stats"] = auxes["batch_stats"]
                micro_valid = re(valid).sum(axis=1)
        else:
            loss, grads, aux, correct = grad_one(
                img, ques, answers, qlen, valid, soft, rng
            )
            micro_valid = None

        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = _merge_batch_stats(params, aux, micro_valid)
        return params, opt_state, loss, correct

    def _eval_step_fn(self, params, img, ques, answers, qlen, valid, soft):
        logits, _ = self.model.apply(
            params, self.cfg, img, ques, ques_length=qlen, train=False,
            valid=valid,
        )
        loss = self._loss(logits, answers, soft, valid)
        labels = self._labels(answers, soft)
        return (
            loss,
            correct_count(logits, labels, valid),
            topk_correct_count(logits, labels, k=3, valid=valid),
            # per-sample argmax, fetched host-side for the official VQA
            # consensus metric (losses.vqa_consensus_scores)
            jnp.argmax(logits, axis=-1),
        )

    # ------------------------------------------------------------------
    # device feeding
    # ------------------------------------------------------------------

    def _build_feature_bank(self, store: FeatureStore, out_dt):
        """Upload the whole store to HBM once (Config.device_feature_bank).

        Returns ``(kind, table, scale, lookup)``: the bank arrays plus the
        jitted in-graph gather. Two placements
        (``Config.device_feature_bank_shard``):

        - **replicated** (default): every device holds the full table; the
          lookup is a local gather. HBM cost = store bytes PER DEVICE.
        - **sharded over 'data'**: device d holds the row block
          ``[d*n/D, (d+1)*n/D)``; the lookup is a ring exchange over ICI
          (``lax.ppermute``): each data shard's (indices, accumulator)
          pair visits every table shard once, and the owner fills the rows
          it has via ``where`` (no float adds — bit-exact). HBM cost =
          store bytes / D per device, so bank capacity SCALES with the
          mesh; peak temporary is one per-device batch slice, and the
          moved bytes equal the batch's feature bytes — over ICI instead
          of the host link.

        Either placement stores EXACTLY the bytes the host feed would ship
        per batch (int8 rows + f16 scales, or f16 rows upcast in-graph —
        the f16->f32 upcast is exact) and applies the same dequant
        expression as ``self._dequant``, so training under the bank is
        bit-identical to the host feed and to the other placement (pinned
        by tests/test_device_bank_train.py).
        """
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from vqa_attention_networks_tpu.parallel.mesh import DATA_AXIS
        from vqa_attention_networks_tpu.parallel.sharding import place_global

        n = len(store)
        quantized = bool(getattr(store, "quantized", False))
        regions = getattr(store, "num_regions", None)
        channels = getattr(store, "channels", None)
        if regions is None or channels is None:  # CombinedFeatureStore
            probe = store.gather_rows(np.arange(1), dtype=np.float16)
            regions, channels = probe.shape[1], probe.shape[2]

        def _native_f16(s) -> bool:
            if hasattr(s, "stores"):
                return all(_native_f16(m) for m in s.stores)
            dt = getattr(getattr(s, "features", None), "dtype", None)
            return dt == np.float16

        # dtype the host feed would ship (the lookup's output dtype) ...
        feed_dt = (
            np.float16 if self.cfg.compute_dtype == "bfloat16"
            else np.float32
        )
        # ... and the dtype the table is RESIDENT in: an f16-native store
        # stays f16 in HBM even under f32 compute (the in-graph upcast is
        # exact, so bit-parity with the f32 host feed holds at half the
        # HBM cost)
        table_dt = (
            np.float16 if _native_f16(store) or feed_dt == np.float16
            else np.float32
        )

        sharded = bool(self.cfg.device_feature_bank_shard)
        ndata = int(self.mesh.shape[DATA_AXIS])
        if ndata == 1:
            sharded = False  # one data shard: sharded == replicated
        n_rows = n + ((-n) % ndata if sharded else 0)  # pad so D | rows
        row_bytes = (
            regions * channels + channels * 2 if quantized
            else regions * channels * np.dtype(table_dt).itemsize
        )
        bank_bytes = n_rows * row_bytes
        per_device = bank_bytes // (ndata if sharded else 1)
        budget = self.cfg.device_feature_bank_budget
        if per_device > budget:
            hint = (
                "" if sharded or ndata == 1 else
                " shard the bank over the data axis "
                "(Config.device_feature_bank_shard — per-device cost "
                f"drops {ndata}x to "
                f"{bank_bytes / ndata / 2**30:.1f} GiB on this mesh),"
            )
            raise ValueError(
                f"device_feature_bank: store needs "
                f"{per_device / 2**30:.1f} GiB per device ({n} images x "
                f"{row_bytes} B"
                f"{f', sharded {ndata}-way' if sharded else ''}), over "
                f"the {budget / 2**30:.1f} GiB per-device budget "
                "(Config.device_feature_bank_budget). Quantize the store "
                "(tools/quantize_store.py, 2-4x smaller)," + hint +
                " raise the budget if the chip has headroom "
                "(cli/train.py --device_feature_bank_budget GIB), or "
                "fall back to the host feed."
            )
        spec = P(DATA_AXIS) if sharded else P()
        out = batch_sharding(self.mesh)
        # dense canonical row order — a CombinedFeatureStore's encoded
        # (store << 40) | row handles cannot index a concatenated table
        all_rows = (
            store.all_rows() if hasattr(store, "all_rows")
            else np.arange(n, dtype=np.int64)
        )

        def _pad(a):
            if n_rows == n:
                return a
            fill = np.zeros((n_rows - n,) + a.shape[1:], a.dtype)
            return np.concatenate([a, fill], axis=0)

        def _ring_lookup(fill, acc_dt, n_tables):
            """Sharded-bank gather: rotate each data shard's (indices,
            accumulator) around the 'data' ICI ring; at each stop the
            local table shard fills the rows it owns. D rotations return
            the pair home having visited every shard."""
            perm = [(j, (j + 1) % ndata) for j in range(ndata)]

            def shard_fn(*a):
                t_loc, r_loc = a[:-1], a[-1]
                rows_per = t_loc[0].shape[0]
                acc = jnp.zeros((r_loc.shape[0], regions, channels), acc_dt)
                for _ in range(ndata):
                    d = jax.lax.axis_index(DATA_AXIS)
                    local = r_loc - d * rows_per
                    ok = (local >= 0) & (local < rows_per)
                    safe = jnp.clip(local, 0, rows_per - 1)
                    acc = jnp.where(ok[:, None, None],
                                    fill(t_loc, safe), acc)
                    r_loc = jax.lax.ppermute(r_loc, DATA_AXIS, perm)
                    acc = jax.lax.ppermute(acc, DATA_AXIS, perm)
                return acc

            return jax.jit(shard_map(
                shard_fn, mesh=self.mesh,
                in_specs=tuple(P(DATA_AXIS) for _ in range(n_tables + 1)),
                out_specs=P(DATA_AXIS),
            ))

        if quantized:
            q, s = store.gather_rows_quantized(all_rows)
            q, s = _pad(q), _pad(s)
            if sharded:
                lookup = _ring_lookup(
                    lambda t, r: (t[0][r].astype(out_dt)
                                  * t[1][r][:, None, :].astype(out_dt)),
                    out_dt, n_tables=2,
                )
            else:
                lookup = jax.jit(
                    lambda t, sc, r: (
                        t[r].astype(out_dt)
                        * sc[r][:, None, :].astype(out_dt)
                    ),
                    out_shardings=out,
                )
            return ("q", place_global(self.mesh, q, spec),
                    place_global(self.mesh, s, spec), lookup)
        table = _pad(store.gather_rows(all_rows, dtype=table_dt))
        if sharded:
            lookup = _ring_lookup(
                lambda t, r: t[0][r].astype(feed_dt), feed_dt, n_tables=1,
            )
        else:
            # emits the dtype the host feed ships — the model casts on
            # device either way, keeping the two feeds bit-identical
            lookup = jax.jit(
                lambda t, r: t[r].astype(feed_dt), out_shardings=out
            )
        return ("f", place_global(self.mesh, table, spec), None, lookup)

    def _device_batch(self, batch: Batch) -> Tuple:
        soft = batch.soft_answers
        if soft is None:
            # static placeholder keeps one compiled signature per model
            soft = np.zeros((len(batch), 1), np.float32)
        if self._bank is not None:
            rows, ques, answers, qlen, valid, soft = shard_batch(
                self.mesh,
                (
                    batch.image_rows,
                    batch.questions,
                    batch.answers,
                    batch.ques_length,
                    batch.valid,
                    soft,
                ),
            )
            kind, table, scale, lookup = self._bank
            img = (
                lookup(table, scale, rows) if kind == "q"
                else lookup(table, rows)
            )
            return (img, ques, answers, qlen, valid, soft)
        img, ques, answers, qlen, valid, soft, scale = shard_batch(
            self.mesh,
            (
                batch.image_features,
                batch.questions,
                batch.answers,
                batch.ques_length,
                batch.valid,
                soft,
                batch.feature_scale,
            ),
        )
        if scale is not None:
            # on-device dequant of the int8 feed (one fused multiply; the
            # step functions then see an ordinary float batch)
            img = self._dequant(img, scale)
        return (img, ques, answers, qlen, valid, soft)

    # ------------------------------------------------------------------
    # driver loops (solver.py:52-117)
    # ------------------------------------------------------------------

    def train(self) -> Dict[str, float]:
        cfg = self.cfg
        iters_per_epoch = len(self.batches["train"])
        if iters_per_epoch == 0:
            raise ValueError(
                "training split is empty — nothing to train on (check "
                "--data_dir / the prepared artifact)"
            )
        print(f"Model: {cfg.model_name}")
        print(f"total training iterations: {cfg.num_epoch * iters_per_epoch}")

        profiling = False
        if cfg.profile_steps > 0:
            jax.profiler.start_trace(cfg.profile_dir)
            profiling = True

        last = {}
        # resume-aware: restarting from a checkpoint at step S replays the
        # same epoch boundaries, batch order and dropout keys. A mid-epoch
        # checkpoint (step % iters != 0) resumes *inside* its epoch: the
        # shuffle is a pure function of (seed, epoch), so the already-trained
        # prefix of the restart epoch is skipped rather than replayed.
        start_epoch, skip_batches = divmod(self.step, max(iters_per_epoch, 1))
        for epoch in range(start_epoch, cfg.num_epoch):
            timer = Timer()
            timer.tic()
            seen = 0
            loss = acc = 0.0
            start_b = skip_batches if epoch == start_epoch else 0
            # cap at the host's core count: extra assembly threads on a
            # small host just contend (measured 2.2x SLOWER at 4 threads
            # on 1 core, bench_host_pipeline.py)
            workers = min(cfg.prefetch_workers, os.cpu_count() or 1)
            if workers > 1:
                # thread-pool assembly (dataset.parallel_epoch): readahead
                # is the bounded future queue, so no extra prefetch thread
                stream = self.batches["train"].parallel_epoch(
                    epoch, start_batch=start_b, workers=workers
                )
            else:
                stream = prefetch(
                    self.batches["train"].epoch(epoch, start_batch=start_b)
                )
            for batch in stream:
                key = jax.random.fold_in(self._rng_base, self.step)
                dev = self._device_batch(batch)
                self.params, self.opt_state, loss_d, correct_d = self._train_step(
                    self.params, self.opt_state, *dev, key
                )
                self.step += 1
                seen += int(batch.valid.sum())
                if profiling and self.step >= cfg.profile_steps:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), loss_d
                    )
                    jax.profiler.stop_trace()
                    profiling = False
                if cfg.checkpoint_every_steps and (
                    self.step % cfg.checkpoint_every_steps == 0
                ):
                    self.save_checkpoint()
            # sync once per epoch for metrics
            loss = float(loss_d)
            acc = float(correct_d) / max(int(batch.valid.sum()), 1)
            if not np.isfinite(loss):
                # failure detection (SURVEY §5): a non-finite loss means
                # every step since it appeared was wasted — abort with the
                # debugging recipe instead of silently training garbage.
                raise FloatingPointError(
                    f"non-finite train loss at epoch {epoch} step "
                    f"{self.step}. Recipe: rerun with Config.debug_nans=1 "
                    f"(traps the originating op), check the feature store "
                    f"for clamp warnings (data/feature_store.py), or drop "
                    f"to --compute_dtype float32 to rule out bf16 overflow."
                )
            elapsed = timer.toc(average=False)
            qps = seen / max(elapsed, 1e-9)

            val_loss, val_acc = self.val()  # single batch, like solver.py:154-156
            print(
                f">>> epoch {epoch} step {self.step} | train loss {loss:.5f} "
                f"acc {acc:.4f} | val loss {val_loss:.5f} acc {val_acc:.4f} "
                f"| {qps:.0f} qa-pairs/s"
            )
            self.writer.add_scalars(
                f"{cfg.model_name}/loss",
                {"train loss": loss, "val loss": val_loss}, self.step,
            )
            self.writer.add_scalars(
                f"{cfg.model_name}/acc",
                {"train acc": acc, "val acc": val_acc}, self.step,
            )
            self.writer.add_scalar(f"{cfg.model_name}/qa_pairs_per_sec", qps,
                                   self.step)
            last = {"train_loss": loss, "train_acc": acc,
                    "val_loss": val_loss, "val_acc": val_acc, "qps": qps}

            if cfg.early_stopping:
                # metric choice: val loss (solver.py:160-172) or val accuracy
                # (legacy trainer, train_hfd.py:154-166)
                if cfg.early_stop_metric == "acc":
                    improved = val_acc > self.best_val_acc
                    if improved:
                        self.best_val_acc = val_acc
                else:
                    improved = val_loss < self.min_val_loss
                    if improved:
                        self.min_val_loss = val_loss
                if improved:
                    self.i_patience = 0
                    # Materialised copy (the functional analog of the
                    # reference's copy.deepcopy, solver.py:62). A bare
                    # tree_map(lambda x: x, ...) would alias the same Array
                    # buffers the next _train_step donates
                    # (donate_argnums=(0,1)) and die with
                    # "Array has been deleted" at save().
                    self.best_params = jax.tree_util.tree_map(
                        jnp.copy, self.params
                    )
                else:
                    self.i_patience += 1
                if self.i_patience >= cfg.patience:
                    print(
                        f"validation {cfg.early_stop_metric} has not improved "
                        f"for {cfg.patience} epochs, stopping"
                    )
                    break
        return last

    def val(self, full: bool = False) -> Tuple[float, float]:
        """Validation. ``full=False`` scores one batch (the reference's
        training-mode behaviour, solver.py:154-156); ``full=True`` sweeps the
        split and writes the results artifact (solver.py:174-182)."""
        cfg = self.cfg
        total_correct = total_top3 = total_consensus = 0.0
        have_consensus = have_types = False
        n_types = len(ANSWER_TYPE_NAMES)
        type_n = np.zeros(n_types)
        type_correct = np.zeros(n_types)
        type_consensus = np.zeros(n_types)
        qtype_stats: dict = {}  # code -> [n, correct]
        predictions: list = []
        total_valid = 0
        n_batches = 0
        loss = loss_sum = 0.0
        for batch in self.batches["val"].epoch():
            dev = self._device_batch(batch)
            loss_d, correct_d, top3_d, preds_d = self._eval_step(
                self.params, *dev
            )
            n_valid = int(batch.valid.sum())
            loss = float(loss_d)
            # valid-weighted so the full sweep reports the SPLIT mean, not
            # the last (padded, possibly 1-valid-row) batch's loss
            loss_sum += loss * n_valid
            total_correct += float(correct_d)
            total_top3 += float(top3_d)
            # Host-side per-sample metrics (official VQA consensus +
            # per-answer-type breakdown). Multi-host runs gather the [B]
            # preds to every host (host_fetch — the scalar metrics above
            # come back replicated, a per-sample fetch would touch
            # non-addressable shards without the gather); the host-side
            # batch fields are already identical on every host, so every
            # host accumulates the same figures and the primary writes.
            host_metrics = (
                full
                and (batch.soft_n is not None
                     or batch.answer_types is not None
                     or batch.question_ids is not None
                     or batch.question_types is not None)
            )
            scores = None
            if host_metrics:
                preds = host_fetch(preds_d)
                valid_np = np.asarray(batch.valid)
            if host_metrics and batch.question_ids is not None:
                # official VQA submission rows (valid rows only; pad rows of
                # the final batch carry repeated ids)
                for qid, p in zip(batch.question_ids[valid_np],
                                  preds[valid_np]):
                    predictions.append({
                        "question_id": int(qid),
                        "answer": self._answer_words.get(int(p), "UNK"),
                    })
            if host_metrics and batch.soft_n is not None:
                # official VQA accuracy (leave-one-out consensus) from the
                # sparse annotator data, for every model family
                # (losses.vqa_consensus_scores)
                scores = vqa_consensus_scores(
                    batch.soft_idx, batch.soft_val, preds, batch.soft_n
                )
                total_consensus += float((scores * valid_np).sum())
                have_consensus = True
            want_qtypes = (
                batch.question_types is not None
                and self._question_type_names is not None
            )
            if host_metrics and (batch.answer_types is not None
                                 or want_qtypes):
                # exact-match against the same labels the device metric
                # scores (one definition: _labels)
                labels = np.asarray(
                    self._labels(batch.answers, batch.soft_answers)
                )
                hit = (preds == labels) & valid_np
            if host_metrics and batch.answer_types is not None:
                # per-answer-type breakdown (yes/no, number, other — the
                # official leaderboard split)
                for t in range(n_types):
                    mask = (batch.answer_types == t) & valid_np
                    type_n[t] += mask.sum()
                    type_correct[t] += (hit & mask).sum()
                    if scores is not None:
                        type_consensus[t] += float((scores * mask).sum())
                have_types = True
            if host_metrics and want_qtypes:
                # perQuestionType breakdown (~65 types in VQA v2) — JSON
                # record only, too wide for stdout
                for t in np.unique(batch.question_types[valid_np]):
                    if t < 0:
                        continue
                    mask = (batch.question_types == t) & valid_np
                    d = qtype_stats.setdefault(int(t), [0.0, 0.0, 0.0])
                    d[0] += float(mask.sum())
                    d[1] += float((hit & mask).sum())
                    if scores is not None:
                        # the official accPerQuesType is consensus-based —
                        # bucket the already-computed per-sample scores
                        d[2] += float((scores * mask).sum())
            total_valid += n_valid
            n_batches += 1
            if not full:
                break

        acc_exact = total_correct / max(total_valid, 1)
        if not full:
            return loss, acc_exact
        loss = loss_sum / max(total_valid, 1)

        # reference-compatible denominator counts pad rows (solver.py:177)
        acc_ref = total_correct / max(n_batches * cfg.batch_size, 1)
        top3 = total_top3 / max(total_valid, 1)
        if is_primary():  # results artifacts are written once per run
            os.makedirs(cfg.results_dir, exist_ok=True)
            with open(
                os.path.join(cfg.results_dir, cfg.model_name + ".txt"), "w"
            ) as f:
                f.write("Evaluation accuracy: %.6f" % acc_ref)
            with open(
                os.path.join(cfg.results_dir, cfg.model_name + ".json"), "w"
            ) as f:
                record = {
                    "accuracy": acc_exact,
                    "accuracy_reference_denominator": acc_ref,
                    "top3_accuracy": top3,
                    "num_examples": total_valid,
                    "time": time.time(),
                }
                consensus_note = ""
                if have_consensus:
                    consensus = total_consensus / max(total_valid, 1)
                    record["vqa_consensus_accuracy"] = consensus
                    consensus_note = f", VQA consensus {consensus:.6f}"
                if have_types:
                    record["per_answer_type"] = {
                        ANSWER_TYPE_NAMES[t]: {
                            "accuracy": type_correct[t] / max(type_n[t], 1),
                            "num_examples": int(type_n[t]),
                            **({"vqa_consensus_accuracy":
                                type_consensus[t] / max(type_n[t], 1)}
                               if have_consensus else {}),
                        }
                        for t in range(n_types) if type_n[t] > 0
                    }
                if qtype_stats:
                    names = self._question_type_names
                    record["per_question_type"] = {
                        names[t]: {
                            "accuracy": c / max(n, 1),
                            "num_examples": int(n),
                            # the official breakdown's metric
                            **({"vqa_consensus_accuracy": cons / max(n, 1)}
                               if have_consensus else {}),
                        }
                        for t, (n, c, cons) in sorted(
                            qtype_stats.items(),
                            key=lambda kv: names[kv[0]],
                        )
                    }
                json.dump(record, f)
            if predictions:
                # official VQA leaderboard submission schema: a JSON list of
                # {"question_id": int, "answer": str} — uploadable as-is
                sub_path = os.path.join(
                    cfg.results_dir, cfg.model_name + "_predictions.json"
                )
                with open(sub_path, "w") as f:
                    json.dump(predictions, f)
                print(f"Wrote {len(predictions)} predictions in the official "
                      f"submission format: {sub_path}")
            print(f"Evaluation accuracy: {acc_ref:.6f} (exact {acc_exact:.6f},"
                  f" top-3 {top3:.6f}{consensus_note})")
            if have_types:
                parts = ", ".join(
                    f"{ANSWER_TYPE_NAMES[t]} "
                    f"{type_correct[t] / max(type_n[t], 1):.6f}"
                    f" (n={int(type_n[t])})"
                    for t in range(n_types) if type_n[t] > 0
                )
                print(f"Per answer type: {parts}")
        return loss, acc_exact

    # ------------------------------------------------------------------
    # persistence (solver.py:184-190, upgraded)
    # ------------------------------------------------------------------

    def _state(self):
        # Resume checkpoints carry the CURRENT state plus the early-stop
        # bookkeeping (min_val_loss / patience / best snapshot) so a resumed
        # run continues the patience countdown and final-weights selection
        # exactly where it left off. ``best_params`` falls back to the live
        # params purely to keep a fixed tree structure for Orbax; ``has_best``
        # records whether a real snapshot existed.
        best = self.best_params if self.best_params is not None else self.params
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": jnp.asarray(self.step),
            "best_params": best,
            "early_stop": {
                "min_val_loss": jnp.asarray(self.min_val_loss, jnp.float32),
                "best_val_acc": jnp.asarray(self.best_val_acc, jnp.float32),
                "i_patience": jnp.asarray(self.i_patience),
                "has_best": jnp.asarray(
                    1 if self.best_params is not None else 0
                ),
            },
        }

    def save_checkpoint(self) -> str:
        path = ckpt.save_checkpoint(
            os.path.join(self.cfg.out_dir, self.cfg.model_name),
            self._state(), self.step,
            keep=self.cfg.keep_checkpoints or None,
        )
        return path

    def restore(self, step: Optional[int] = None) -> None:
        state = ckpt.restore_checkpoint(
            os.path.join(self.cfg.out_dir, self.cfg.model_name),
            self._state(), step,
        )
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step = int(state["step"])
        es = state["early_stop"]
        self.min_val_loss = float(es["min_val_loss"])
        self.best_val_acc = float(es["best_val_acc"])
        self.i_patience = int(es["i_patience"])
        self.best_params = (
            state["best_params"] if int(es["has_best"]) else None
        )

    def save(self) -> str:
        """Final save (the counterpart of solver.py:184-190): a full resume
        checkpoint plus a weights-only export for the predict/serve paths."""
        path = self.save_checkpoint()
        params = self.best_params if self.best_params is not None else self.params
        ckpt.save_weights(
            os.path.join(self.cfg.out_dir, self.cfg.model_name), params
        )
        return path

    def close(self) -> None:
        self.writer.close()
