"""Batch pipeline: packed QA arrays + feature store -> device-ready batches.

Replaces the reference's ``VqaDataset``/``DataLoader`` with 4 worker
processes (``data_loader.py:10-60``, ``solver.py:41``). Everything here is
vectorised NumPy over the packed artifact:

- batch assembly is fancy indexing (no per-item Python, no per-item file I/O);
- every batch has **static shapes** — the final partial batch is padded to
  ``batch_size`` with a ``valid`` mask so XLA compiles exactly one program;
- a single background thread overlaps host gather with device compute
  (double-buffering via ``jax.device_put``);
- GloVe vectors are *not* shipped per batch: the model embeds them on device
  from a frozen [q_vocab_size, 300] table (see ``data/glove.py``), unlike the
  reference's per-item spaCy lookup (``data_loader.py:47-56``).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from vqa_attention_networks_tpu.data.feature_store import FeatureStore
from vqa_attention_networks_tpu.data.prepare import QASplit


@dataclass
class Batch:
    """One device-ready batch. ``soft_answers`` is densified on the host
    (cheap: B x 10 scatter) exactly as ``data_loader.py:39-42`` does."""

    # [B, 196, 2048] (int8 when quantized feed); None in device-bank mode
    # (Config.device_feature_bank) — the solver gathers rows from HBM via
    # ``image_rows`` instead of shipping features host->device
    image_features: Optional[np.ndarray]
    questions: np.ndarray  # [B, T] int32
    answers: np.ndarray  # [B] int32 hard labels
    ques_length: np.ndarray  # [B] int32
    valid: np.ndarray  # [B] bool — False on pad rows of the final batch
    soft_answers: Optional[np.ndarray] = None  # [B, A] float32
    # HOST-ONLY sparse annotator data for the official VQA consensus
    # metric, attached for EVERY model family (not just soft-trained ones;
    # the metric is a property of the dataset, not the training loss):
    # raw annotator counts = soft_val * soft_n. All None for artifacts
    # written before QASplit.soft_n existed.
    soft_idx: Optional[np.ndarray] = None  # [B, W] int32, -1 padded
    soft_val: Optional[np.ndarray] = None  # [B, W] float32
    soft_n: Optional[np.ndarray] = None  # [B] int32
    # host-only per-question answer-type codes (prepare.ANSWER_TYPE_CODES;
    # -1 unknown) for the official per-type eval breakdown
    answer_types: Optional[np.ndarray] = None  # [B] int32
    # host-only VQA question ids for the leaderboard-submission export
    question_ids: Optional[np.ndarray] = None  # [B] int64
    # host-only question-type codes (QAData.question_type_names) for the
    # official perQuestionType eval breakdown
    question_types: Optional[np.ndarray] = None  # [B] int32
    # int8 stores: per-(sample, channel) f16 dequant scales; the solver
    # dequantises ON DEVICE (int8 crosses host->device, 4x less traffic
    # than the f32 feed, 2x less than f16)
    feature_scale: Optional[np.ndarray] = None  # [B, C] float16
    # device-feature-bank feed (Config.device_feature_bank): store row
    # indices instead of feature bytes; the Solver gathers from its
    # HBM-resident bank in-graph. image_features/feature_scale are None.
    image_rows: Optional[np.ndarray] = None  # [B] int32

    def __len__(self) -> int:
        return int(self.questions.shape[0])


class VqaBatches:
    """Epoch iterator over one split."""

    def __init__(
        self,
        split: QASplit,
        store: FeatureStore,
        batch_size: int,
        num_answers: int,
        soft_answer: bool,
        shuffle: bool = True,
        seed: int = 0,
        feature_dtype=np.float32,
        drop_remainder: bool = False,
        device_bank: bool = False,
    ):
        self.split = split
        self.store = store
        self.batch_size = batch_size
        self.num_answers = num_answers
        self.soft_answer = soft_answer
        self.shuffle = shuffle
        self.feature_dtype = feature_dtype
        self.drop_remainder = drop_remainder
        # device_bank: skip the host feature gather entirely — batches carry
        # store ROW indices and the Solver gathers from its HBM bank in-graph
        self.device_bank = device_bank
        self.seed = seed
        self._epoch = 0
        # Resolve image_id -> store row once; per-batch gather is then pure
        # integer indexing into the memmap.
        self._rows = store.rows_for(split.image_ids)
        # Device-bank rows must be DENSE positions in [0, n): a
        # CombinedFeatureStore's handles are (store << 40) | row, which
        # neither fit int32 nor index the concatenated bank table. The
        # hasattr guard mirrors Solver._build_feature_bank's all_rows
        # fallback: duck-typed stores without the dense-rows API have
        # dense handles already.
        self._bank_rows = None
        if device_bank:
            dense = (
                store.dense_rows(self._rows)
                if hasattr(store, "dense_rows") else np.asarray(self._rows)
            )
            self._bank_rows = dense.astype(np.int32)

    def __len__(self) -> int:
        n = len(self.split)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _densify_soft(self, idx: np.ndarray) -> np.ndarray:
        sidx = self.split.soft_idx[idx]
        sval = self.split.soft_val[idx]
        # one-pass native scatter (native/dataplane.cpp) with NumPy fallback
        from vqa_attention_networks_tpu.data import native

        dense = native.densify_soft(sidx, sval, self.num_answers)
        if dense is not None:
            return dense
        from vqa_attention_networks_tpu.data.prepare import densify_soft_np

        return densify_soft_np(sidx, sval, self.num_answers)

    def _assemble(self, idx: np.ndarray) -> Batch:
        b = len(idx)
        bs = self.batch_size
        valid = np.ones(bs, dtype=bool)
        if b < bs:  # pad the final batch to static shape
            valid[b:] = False
            idx = np.concatenate([idx, np.broadcast_to(idx[-1:], (bs - b,))])
        scale = None
        rows = None
        if self.device_bank:
            feats = None
            rows = self._bank_rows[idx]
        elif np.dtype(self.feature_dtype) == np.int8:
            feats, scale = self.store.gather_rows_quantized(self._rows[idx])
        else:
            feats = self.store.gather_rows(
                self._rows[idx], dtype=self.feature_dtype
            )
        return Batch(
            image_features=feats,
            questions=self.split.questions[idx].astype(np.int32),
            answers=self.split.answers[idx].astype(np.int32),
            ques_length=self.split.ques_length[idx].astype(np.int32),
            valid=valid,
            soft_answers=self._densify_soft(idx) if self.soft_answer else None,
            soft_idx=(self.split.soft_idx[idx]
                      if self.split.soft_n is not None else None),
            soft_val=(self.split.soft_val[idx]
                      if self.split.soft_n is not None else None),
            soft_n=(self.split.soft_n[idx].astype(np.int32)
                    if self.split.soft_n is not None else None),
            answer_types=(self.split.answer_types[idx].astype(np.int32)
                          if self.split.answer_types is not None else None),
            question_ids=(self.split.question_ids[idx].astype(np.int64)
                          if self.split.question_ids is not None else None),
            question_types=(self.split.question_types[idx].astype(np.int32)
                            if self.split.question_types is not None
                            else None),
            feature_scale=scale,
            image_rows=rows,
        )

    def epoch(
        self, epoch_index: Optional[int] = None, start_batch: int = 0
    ) -> Iterator[Batch]:
        """One epoch of batches.

        Shuffling is a pure function of ``(seed, epoch_index)`` so that
        checkpoint-resume replays the exact batch order (the reference's
        DataLoader order is unrecoverable after its crash-loses-everything
        save-at-end design, solver.py:184-190). Without an explicit index an
        internal counter advances per call. ``start_batch`` skips the first
        batches without assembling them — mid-epoch resume lands exactly
        where the checkpoint left off at zero gather cost.
        """
        for idx in self.epoch_indices(epoch_index, start_batch):
            yield self._assemble(idx)

    def epoch_indices(
        self, epoch_index: Optional[int] = None, start_batch: int = 0
    ) -> Iterator[np.ndarray]:
        """The epoch's batch-index stream without assembly — the input to
        ``parallel_assemble`` (assembly is a pure function of the indices,
        so it can run on a worker pool; the order stream stays the single
        source of truth for resume determinism)."""
        if epoch_index is None:
            epoch_index = self._epoch
        self._epoch = epoch_index + 1
        n = len(self.split)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, epoch_index)).shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_remainder else n
        for start in range(start_batch * self.batch_size, stop, self.batch_size):
            yield order[start : start + self.batch_size]

    def parallel_epoch(
        self,
        epoch_index: Optional[int] = None,
        start_batch: int = 0,
        workers: int = 4,
        depth: Optional[int] = None,
    ) -> Iterator[Batch]:
        """Epoch with thread-pool batch assembly, in order.

        The counterpart of the reference's 4 DataLoader worker processes
        (cfg.py:6, solver.py:41), as threads: the heavy per-batch work — the
        feature gather (native/dataplane.cpp) and the soft-label densify —
        runs in C with the GIL released, so threads scale on a multi-core
        TPU-VM host without pickling batches across processes. Order is
        identical to ``epoch()`` (ordered completion), so checkpoint-resume
        and bit-determinism are unaffected. In-flight work is bounded by
        ``depth`` batches (default ``workers + 1``).
        """
        if workers <= 1:
            yield from self.epoch(epoch_index, start_batch)
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        depth = depth or workers + 1
        with ThreadPoolExecutor(max_workers=workers) as ex:
            pending: "deque" = deque()
            try:
                for idx in self.epoch_indices(epoch_index, start_batch):
                    pending.append(ex.submit(self._assemble, idx))
                    if len(pending) >= depth:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()
            finally:
                # consumer abandoned mid-epoch (train-step exception, early
                # break): drop queued work so executor shutdown only waits
                # for the <= ``workers`` already-running assemblies
                for f in pending:
                    f.cancel()


def prefetch(iterator: Iterator[Batch], depth: int = 2) -> Iterator[Batch]:
    """Run ``iterator`` on a background thread, ``depth`` batches ahead.

    The host-side analog of the reference's DataLoader workers (cfg.py:6):
    feature-gather and soft-label densification overlap with the device step.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    err: list = []
    stop = threading.Event()

    def producer() -> None:
        try:
            for item in iterator:
                # bounded-put with a stop check: if the consumer abandons
                # the generator (exception in the train step, early break),
                # a plain q.put would block forever and pin depth+1
                # assembled batches plus this thread
                while True:
                    if stop.is_set():
                        return
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            # the sentinel must actually ARRIVE when the consumer is still
            # listening (a dropped sentinel deadlocks the consumer's q.get);
            # the stop check covers the abandoned-consumer case
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
