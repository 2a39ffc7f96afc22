"""Packed, memory-mappable image feature store.

The reference persists one tiny ``.npy`` per image (~123k files/split,
``extract_image_features.py:81-84``) and pays a file open + load + transpose
per training item (``data_loader.py:29-32``). At the 10k QA-pairs/sec/chip
target that per-item cost dominates, so the store here is a single packed
binary per split:

    <dir>/features.bin    float16, shape [num_images, 196, 2048], row-major
    <dir>/index.json      {"image_ids": [...], "shape": [...], "dtype": ...}

Reads are NumPy fancy-indexing into a memmap — batch gather is one vectorised
operation, zero per-item Python. float16 halves HBM traffic and host I/O; the
models upcast (or run bf16) on device.
"""

from __future__ import annotations

import json
import os
from os.path import join
from typing import Dict, Iterable, Optional, Sequence

import numpy as np

FEATURES_FILE = "features.bin"
INDEX_FILE = "index.json"
SCALES_FILE = "scales.bin"  # int8 stores: per-image-per-channel f16 scales


def quantize_features(features: np.ndarray):
    """int8 symmetric quantization, one f16 scale per (image, channel).

    Feature grids are backbone activations whose dynamic range varies far
    more across channels than within one channel's 196 regions, so
    per-channel scales keep the relative error ~1/254 of each channel's own
    max — the right granularity for a store consumed as matmul input.

    THE quantization scheme: the store writer and every consumer measuring
    its accuracy (benchmarks/bench_precision.py --int8_feed) share this
    function. Returns ``(int8 [B, L, C], f16 scales [B, C], n_clamped)``.

    The scale is computed in f32 and clamped into f16's finite range: an
    f32 channel max above 127 * 65504 would otherwise overflow the f16
    scale to inf (dequant = NaN poisoning everything downstream); such
    out-of-range elements saturate to ±127 * 65504 and are counted."""
    features = np.asarray(features, np.float32)
    if features.ndim == 2:
        features = features[None]
    amax = np.abs(features).max(axis=1)  # [B, C]
    f16_max = float(np.finfo(np.float16).max)
    scale32 = np.minimum(amax / 127.0, f16_max)
    scale = scale32.astype(np.float16)
    # zero-max channels (all-dropped relu columns): scale 0 would divide
    # by zero below; any nonzero divisor round-trips the zeros. Sub-f16
    # channel maxima (< ~7.6e-6) flush to scale 0 and dequant to exact 0.
    safe = np.where(scale > 0, scale.astype(np.float32), 1.0)
    q = np.rint(features / safe[:, None, :])
    # true range overflow only (channel max beyond 127 * f16_max): f16
    # rounding of the scale can push |q| to 128 by half an LSB, which the
    # clip absorbs without being worth a saturation warning
    clamped = int((np.abs(features) > 127.0 * f16_max).sum())
    q = np.clip(q, -127, 127).astype(np.int8)
    return q, scale, clamped


class FeatureStoreWriter:
    """Streaming writer used by the feature-extraction CLI."""

    def __init__(
        self,
        directory: str,
        num_regions: int = 196,
        channels: int = 2048,
        dtype: str = "float16",
    ):
        self.directory = directory
        self.num_regions = num_regions
        self.channels = channels
        self.dtype = np.dtype(dtype)
        os.makedirs(directory, exist_ok=True)
        self._file = open(join(directory, FEATURES_FILE), "wb")
        self._scales_file = (
            open(join(directory, SCALES_FILE), "wb")
            if self.dtype == np.int8 else None
        )
        self._image_ids: list = []
        self.clamped = 0  # elements saturated into the store dtype's range

    def _quantize(self, features: np.ndarray) -> np.ndarray:
        """int8 quantize a batch via :func:`quantize_features`, streaming
        the per-(image, channel) f16 scales to scales.bin alongside the
        rows. Counts elements saturated by the f16 scale ceiling."""
        q, scale, clamped = quantize_features(features)
        self.clamped += clamped
        self._scales_file.write(np.ascontiguousarray(scale).tobytes())
        return q

    def _narrow(self, features: np.ndarray) -> np.ndarray:
        """Cast to the store dtype, clamping instead of overflowing to inf.

        Pretrained ResNet-152 activations sit far inside the f16 range, but
        an out-of-range value (random-trunk pipelines, corrupted inputs)
        must not silently become inf — downstream bf16/f32 math would turn
        it into NaN losses. Clamp and count instead."""
        features = np.asarray(features)
        bad = int((~np.isfinite(features)).sum())
        if bad:
            # np.clip passes NaN through silently — a poisoned store would
            # only surface later as a NaN-loss abort far from the cause
            raise ValueError(
                f"{bad} non-finite feature values — the trunk or input "
                "images are corrupted; refusing to write a poisoned store"
            )
        if self.dtype == np.int8:
            return self._quantize(features)
        if (self.dtype == np.float16
                and features.dtype.itemsize > self.dtype.itemsize):
            lim = float(np.finfo(np.float16).max)
            over = np.abs(features) > lim
            n = int(over.sum())
            if n:
                self.clamped += n
                features = np.clip(features, -lim, lim)
        return np.ascontiguousarray(features, dtype=self.dtype)

    def append(self, image_id: int, features: np.ndarray) -> None:
        """Append one image's [num_regions, channels] feature grid."""
        # one grid only: a [B, R, C] batch through the int8 path would
        # write B scale rows for 1 feature row, silently misaligning every
        # later image's dequant (use append_batch)
        assert np.ndim(features) == 2, np.shape(features)
        features = self._narrow(features)
        if self.dtype == np.int8:
            features = features[0]
        assert features.shape == (self.num_regions, self.channels), features.shape
        self._file.write(features.tobytes())
        self._image_ids.append(int(image_id))

    def append_batch(self, image_ids: Sequence[int], features: np.ndarray) -> None:
        features = self._narrow(features)
        assert features.shape[1:] == (self.num_regions, self.channels)
        assert len(image_ids) == features.shape[0], (
            f"{len(image_ids)} ids for {features.shape[0]} feature rows — a "
            "mismatch here silently shifts every later row of the store"
        )
        self._file.write(features.tobytes())
        self._image_ids.extend(int(i) for i in image_ids)

    def close(self) -> None:
        self._file.close()
        if self._scales_file is not None:
            self._scales_file.close()
        if self.clamped:
            print(f"WARNING: {self.clamped} feature elements exceeded the "
                  f"{self.dtype.name} range and were clamped "
                  f"(pretrained trunks never produce these — check the "
                  f"weights/inputs)")
        with open(join(self.directory, INDEX_FILE), "w") as f:
            json.dump(
                {
                    "image_ids": self._image_ids,
                    "shape": [len(self._image_ids), self.num_regions, self.channels],
                    "dtype": self.dtype.name,
                },
                f,
            )

    def __enter__(self) -> "FeatureStoreWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            # do NOT write index.json: a partially-extracted store must not
            # look complete (open_feature_store would load it and training
            # would only fail much later on a missing image_id)
            self._file.close()
            if self._scales_file is not None:
                self._scales_file.close()
            print(f"WARNING: extraction aborted ({exc_type.__name__}); "
                  f"{self.directory} left WITHOUT an index — rerun "
                  "extraction to finalize it")
            return
        self.close()


class FeatureStore:
    """Memory-mapped reader with an image_id -> row index."""

    def __init__(self, directory: str):
        with open(join(directory, INDEX_FILE)) as f:
            index = json.load(f)
        shape = tuple(index["shape"])
        self.features = np.memmap(
            join(directory, FEATURES_FILE),
            dtype=np.dtype(index["dtype"]),
            mode="r",
            shape=shape,
        )
        self.scales = None
        if self.features.dtype == np.int8:
            # int8 stores carry per-(image, channel) f16 scales; shipping
            # (int8 rows, scales) to the device and dequantising in-graph
            # halves host gather bytes and H2D traffic vs the f16 store
            self.scales = np.memmap(
                join(directory, SCALES_FILE), dtype=np.float16, mode="r",
                shape=(shape[0], shape[2]),
            )
        self.row_of: Dict[int, int] = {
            img_id: row for row, img_id in enumerate(index["image_ids"])
        }
        self.num_regions = shape[1]
        self.channels = shape[2]

    def __len__(self) -> int:
        return self.features.shape[0]

    def rows_for(self, image_ids: Iterable[int]) -> np.ndarray:
        return np.asarray([self.row_of[int(i)] for i in image_ids], dtype=np.int64)

    def gather(self, image_ids: Sequence[int], dtype=np.float32) -> np.ndarray:
        """Gather a batch of feature grids: [B, num_regions, channels]."""
        return self.gather_rows(self.rows_for(image_ids), dtype)

    def all_rows(self) -> np.ndarray:
        """Every row handle in dense order (CombinedFeatureStore twin)."""
        return np.arange(len(self), dtype=np.int64)

    def dense_rows(self, rows: np.ndarray) -> np.ndarray:
        """Row handles are already dense [0, n) positions here."""
        return np.asarray(rows)

    @property
    def quantized(self) -> bool:
        return self.features.dtype == np.int8

    def gather_rows_quantized(self, rows: np.ndarray):
        """int8 fast path: (int8 [B, L, C], f16 scales [B, C]) — a quarter
        of the f32 gather bytes; dequantisation belongs on the device."""
        assert self.quantized, "gather_rows_quantized needs an int8 store"
        from vqa_attention_networks_tpu.data import native

        rows = np.asarray(rows)
        q = native.gather_i8(self.features, rows)
        if q is None:
            q = np.asarray(self.features[rows])
        # scales are 2 KB/row — the NumPy fancy-index is already cheap
        return q, np.asarray(self.scales[rows])

    def gather_quantized(self, image_ids: Sequence[int]):
        return self.gather_rows_quantized(self.rows_for(image_ids))

    def gather_rows(self, rows: np.ndarray, dtype=np.float32) -> np.ndarray:
        if self.features.dtype == np.int8:
            if np.dtype(dtype) == np.int8:
                return np.asarray(self.features[rows])
            # transparent host-side dequant: every float consumer works
            # against an int8 store unchanged (the fast path is
            # gather_rows_quantized + on-device dequant)
            q = self.features[rows].astype(np.float32)
            s = self.scales[rows].astype(np.float32)
            return (q * s[:, None, :]).astype(dtype)
        # native gather when available (native/dataplane.cpp): fused
        # gather+widen for the f32 feed, raw row memcpy for the f16 feed
        # (the bf16-training configuration — feature_dtype=float16 in
        # train/solver.py)
        if self.features.dtype == np.float16:
            from vqa_attention_networks_tpu.data import native

            out = None
            if dtype == np.float32:
                out = native.gather_f16_to_f32(self.features, np.asarray(rows))
            elif np.dtype(dtype) == np.float16:
                out = native.gather_f16(self.features, np.asarray(rows))
            if out is not None:
                return out
        return np.asarray(self.features[rows], dtype=dtype)


class CombinedFeatureStore:
    """Reader over several stores (e.g. the per-split outputs of the
    extraction CLI: ``resnet152_train`` + ``resnet152_val``), routing each
    image_id to its owning store. COCO train/val image ids are disjoint, so
    the union index is unambiguous."""

    def __init__(self, stores: Sequence["FeatureStore"]):
        assert stores, "need at least one store"
        self.stores = list(stores)
        self.num_regions = stores[0].num_regions
        self.channels = stores[0].channels
        for s_ in self.stores[1:]:
            if (s_.num_regions, s_.channels) != (
                self.num_regions, self.channels
            ):
                raise ValueError(
                    "cannot combine stores with different geometry: "
                    f"{(self.num_regions, self.channels)} vs "
                    f"{(s_.num_regions, s_.channels)} — re-extract with "
                    "matching settings"
                )
        # encoded (store << 40) | row, computed once (rows_for is then a
        # plain lookup); duplicate ids across stores fail loudly — the
        # union index relies on disjoint id spaces (COCO train/val)
        self._owner: Dict[int, int] = {}
        for si, store in enumerate(self.stores):
            for img_id, row in store.row_of.items():
                if img_id in self._owner:
                    raise ValueError(
                        f"image_id {img_id} appears in more than one member "
                        "store — combined stores need disjoint id spaces "
                        "(was a split re-extracted into both?)"
                    )
                self._owner[img_id] = (si << 40) | row

    def __len__(self) -> int:
        return sum(len(s) for s in self.stores)

    def rows_for(self, image_ids: Iterable[int]) -> np.ndarray:
        # encoded (store, row) pairs: store index in the high bits
        return np.asarray(
            [self._owner[int(i)] for i in image_ids],
            dtype=np.int64,
        )

    def gather_rows(self, rows: np.ndarray, dtype=np.float32) -> np.ndarray:
        rows = np.asarray(rows)
        store_idx = rows >> 40
        local = rows & ((1 << 40) - 1)
        out = np.empty(
            (len(rows), self.num_regions, self.channels), dtype=dtype
        )
        for si in np.unique(store_idx):
            sel = store_idx == si
            out[sel] = self.stores[int(si)].gather_rows(local[sel], dtype)
        return out

    def gather(self, image_ids: Sequence[int], dtype=np.float32) -> np.ndarray:
        return self.gather_rows(self.rows_for(image_ids), dtype)

    @property
    def quantized(self) -> bool:
        return all(s.quantized for s in self.stores)

    def all_rows(self) -> np.ndarray:
        """Every row handle, in canonical (store-concatenation) order.

        The device feature bank gathers the table in this order and
        addresses it with ``dense_rows`` — plain positions in [0, n) —
        because the encoded ``(store << 40) | row`` handles neither fit
        int32 nor index a concatenated table."""
        return np.concatenate([
            (np.int64(si) << 40) | np.arange(len(s), dtype=np.int64)
            for si, s in enumerate(self.stores)
        ])

    def dense_rows(self, rows: np.ndarray) -> np.ndarray:
        """Map encoded row handles to dense positions in [0, len(self))."""
        rows = np.asarray(rows)
        store_idx = rows >> 40
        local = rows & ((1 << 40) - 1)
        offsets = np.cumsum([0] + [len(s) for s in self.stores[:-1]])
        return offsets[store_idx] + local

    def gather_rows_quantized(self, rows: np.ndarray):
        assert self.quantized, "gather_rows_quantized needs int8 stores"
        rows = np.asarray(rows)
        store_idx = rows >> 40
        local = rows & ((1 << 40) - 1)
        q = np.empty((len(rows), self.num_regions, self.channels), np.int8)
        s = np.empty((len(rows), self.channels), np.float16)
        for si in np.unique(store_idx):
            sel = store_idx == si
            q[sel], s[sel] = self.stores[int(si)].gather_rows_quantized(
                local[sel]
            )
        return q, s

    def gather_quantized(self, image_ids: Sequence[int]):
        return self.gather_rows_quantized(self.rows_for(image_ids))


def open_feature_store(data_dir: str, feature_type: str = "resnet152"):
    """Open whatever store layout exists: a combined ``<ft>_all`` directory,
    or the per-split ``<ft>_train`` + ``<ft>_val`` pair the extraction CLI
    writes (extract_image_features.py runs per split)."""
    all_dir = join(data_dir, f"{feature_type}_all")
    if os.path.exists(join(all_dir, INDEX_FILE)):
        return FeatureStore(all_dir)
    stores = []
    for split in ("train", "val"):
        d = join(data_dir, f"{feature_type}_{split}")
        if os.path.exists(join(d, INDEX_FILE)):
            stores.append(FeatureStore(d))
    if not stores:
        raise FileNotFoundError(
            f"no feature store under {data_dir} for {feature_type!r} "
            f"(looked for _all, _train, _val)"
        )
    if len(stores) == 1:
        return stores[0]
    return CombinedFeatureStore(stores)


def make_synthetic_feature_store(
    directory: str,
    image_ids: Sequence[int],
    num_regions: int = 196,
    channels: int = 2048,
    seed: int = 0,
    dtype: str = "float16",
) -> FeatureStore:
    """Write a small random store (tests / smoke slices)."""
    rng = np.random.default_rng(seed)
    with FeatureStoreWriter(directory, num_regions, channels, dtype) as w:
        for img_id in image_ids:
            w.append(img_id, rng.standard_normal((num_regions, channels)) * 0.5)
    return FeatureStore(directory)


def quantize_store(src_dir: str, dst_dir: str, batch: int = 256) -> FeatureStore:
    """Convert an existing f16/f32 store to int8 + per-channel scales.

    Re-extraction is expensive (a ResNet-152 pass over ~123k images per
    split); this converts the packed artifact in place-of, streaming in
    ``batch``-row chunks."""
    src = FeatureStore(src_dir)
    if src.quantized:
        raise ValueError(f"{src_dir} is already int8")
    ids = [None] * len(src)
    for img_id, row in src.row_of.items():
        ids[row] = img_id
    with FeatureStoreWriter(
        dst_dir, src.num_regions, src.channels, "int8"
    ) as w:
        for start in range(0, len(src), batch):
            rows = np.arange(start, min(start + batch, len(src)))
            w.append_batch(
                [ids[r] for r in rows],
                np.asarray(src.features[rows], np.float32),
            )
    return FeatureStore(dst_dir)
