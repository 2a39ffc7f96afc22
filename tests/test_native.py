"""Native data-plane kernels vs their NumPy semantics."""

import numpy as np
import pytest

from vqa_attention_networks_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_gather_f16_to_f32(lib):
    rng = np.random.default_rng(0)
    src = rng.standard_normal((10, 4, 8)).astype(np.float16)
    rows = np.array([3, 0, 7, 7], np.int64)
    got = native.gather_f16_to_f32(src, rows)
    want = src[rows].astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_gather_handles_specials(lib):
    src = np.array(
        [[0.0, -0.0, np.inf, -np.inf, np.nan, 65504.0, 6e-8, -6e-8]],
        np.float16,
    )
    got = native.gather_f16_to_f32(src, np.array([0], np.int64))
    want = src.astype(np.float32)
    np.testing.assert_array_equal(
        np.isnan(got), np.isnan(want)
    )
    mask = ~np.isnan(want)
    np.testing.assert_array_equal(got[mask], want[mask])


def test_densify_soft(lib):
    idx = np.array([[0, 2, -1], [1, -1, -1]], np.int32)
    val = np.array([[0.5, 0.5, 0.0], [1.0, 0.0, 0.0]], np.float32)
    got = native.densify_soft(idx, val, num_answers=4)
    want = np.array(
        [[0.5, 0.0, 0.5, 0.0], [0.0, 1.0, 0.0, 0.0]], np.float32
    )
    np.testing.assert_array_equal(got, want)


def test_gather_f16_raw(lib):
    rng = np.random.default_rng(1)
    src = rng.standard_normal((10, 4, 8)).astype(np.float16)
    rows = np.array([9, 1, 1, 0], np.int64)
    got = native.gather_f16(src, rows)
    assert got.dtype == np.float16
    np.testing.assert_array_equal(got, src[rows])


def test_gather_rejects_noncontiguous_and_out_of_range(lib):
    src = np.zeros((10, 8), np.float16)
    with pytest.raises(ValueError):
        native.gather_f16_to_f32(src[:, ::2], np.array([0], np.int64))
    with pytest.raises(IndexError):
        native.gather_f16_to_f32(src, np.array([10], np.int64))
    with pytest.raises(IndexError):
        native.gather_f16(src, np.array([-1], np.int64))


@pytest.mark.parametrize("threads", [2, 5, 16])
def test_threaded_gathers_match_single_thread(lib, monkeypatch, threads):
    """The _mt kernels split rows across host threads; any thread count
    (including more threads than rows) must reproduce the NumPy semantics
    exactly."""
    monkeypatch.setenv("VQA_NATIVE_THREADS", str(threads))
    rng = np.random.default_rng(3)
    src = rng.standard_normal((23, 6, 8)).astype(np.float16)
    rows = rng.integers(0, 23, size=11).astype(np.int64)
    np.testing.assert_array_equal(
        native.gather_f16_to_f32(src, rows), src[rows].astype(np.float32)
    )
    np.testing.assert_array_equal(native.gather_f16(src, rows), src[rows])

    idx = rng.integers(-1, 13, size=(11, 4)).astype(np.int32)
    val = rng.random((11, 4)).astype(np.float32)
    got = native.densify_soft(idx, val, 13)
    want = np.zeros((11, 13), np.float32)
    for i in range(11):
        for j in range(4):
            if idx[i, j] >= 0:
                want[i, idx[i, j]] = val[i, j]
    np.testing.assert_array_equal(got, want)


def test_num_threads_env_override(monkeypatch):
    monkeypatch.setenv("VQA_NATIVE_THREADS", "3")
    assert native.num_threads() == 3
    monkeypatch.setenv("VQA_NATIVE_THREADS", "junk")
    assert native.num_threads() >= 1
    monkeypatch.delenv("VQA_NATIVE_THREADS")
    assert 1 <= native.num_threads() <= 16


def test_feature_store_uses_native(tmp_path, lib):
    from vqa_attention_networks_tpu.data.feature_store import (
        make_synthetic_feature_store,
    )

    store = make_synthetic_feature_store(
        str(tmp_path), image_ids=[5, 9, 11], num_regions=4, channels=8
    )
    batch = store.gather([9, 5], dtype=np.float32)
    want = np.asarray(store.features[store.rows_for([9, 5])], np.float32)
    np.testing.assert_array_equal(batch, want)
    # the f16 feed (bf16 training) routes through the raw native gather
    batch16 = store.gather([11, 9], dtype=np.float16)
    assert batch16.dtype == np.float16
    np.testing.assert_array_equal(
        batch16, np.asarray(store.features[store.rows_for([11, 9])])
    )


def test_batch_pipeline_densify_uses_native(lib):
    from vqa_attention_networks_tpu.data.prepare import SOFT_WIDTH

    rng = np.random.default_rng(2)
    n, a = 7, 13
    idx = np.full((n, SOFT_WIDTH), -1, np.int32)
    val = np.zeros((n, SOFT_WIDTH), np.float32)
    for i in range(n):
        k = int(rng.integers(1, SOFT_WIDTH))
        cols = rng.choice(a, size=k, replace=False).astype(np.int32)
        idx[i, :k] = cols
        val[i, :k] = rng.random(k).astype(np.float32)
    got = native.densify_soft(idx, val, a)
    want = np.zeros((n, a), np.float32)
    for i in range(n):
        for j in range(SOFT_WIDTH):
            if idx[i, j] >= 0:
                want[i, idx[i, j]] = val[i, j]
    np.testing.assert_array_equal(got, want)


def test_feature_store_append_batch_rejects_id_mismatch(tmp_path):
    from vqa_attention_networks_tpu.data.feature_store import (
        FeatureStoreWriter,
    )

    w = FeatureStoreWriter(str(tmp_path / "s"), num_regions=4, channels=8)
    feats = np.zeros((3, 4, 8), np.float32)
    with pytest.raises(AssertionError, match="silently shifts"):
        w.append_batch([1, 2], feats)


def test_combined_store_rejects_geometry_mismatch(tmp_path):
    from vqa_attention_networks_tpu.data.feature_store import (
        CombinedFeatureStore,
        make_synthetic_feature_store,
    )

    a = make_synthetic_feature_store(str(tmp_path / "a"), [1, 2],
                                     num_regions=4, channels=8)
    b = make_synthetic_feature_store(str(tmp_path / "b"), [3, 4],
                                     num_regions=8, channels=8)
    with pytest.raises(ValueError, match="different geometry"):
        CombinedFeatureStore([a, b])


def test_gather_i8_matches_numpy(lib):
    rng = np.random.default_rng(0)
    src = rng.integers(-127, 128, size=(10, 4, 8)).astype(np.int8)
    rows = np.asarray([7, 0, 7, 3], np.int64)
    got = native.gather_i8(src, rows)
    assert got is not None
    np.testing.assert_array_equal(got, src[rows])
    # odd row size: declared fallback (byte-pair kernel can't address it)
    odd = rng.integers(-127, 128, size=(4, 3, 3)).astype(np.int8)
    assert native.gather_i8(odd, np.asarray([1], np.int64)) is None
