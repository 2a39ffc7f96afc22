"""HTTP serving CLI: endpoint contract + dynamic micro-batching.

Starts the real ThreadingHTTPServer from cli/serve.py on a random port over
tiny synthetic artifacts and drives it with urllib — health check, single
predict, batched predict, error paths, and concurrent requests (which the
Batcher must coalesce into shared engine calls without mixing results up).
"""

import argparse
import json
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest

from vqa_attention_networks_tpu.cli import serve as serve_cli
from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.data.feature_store import (
    make_synthetic_feature_store,
)
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.utils import checkpoint as ckpt

MODEL = "iBOWIMG"
IMAGE_IDS = [3, 7, 11, 19]


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("serve_data")
    words = ["what", "color", "is", "the", "cat", "dog", "sky"]
    q_vocab = {w: i + 1 for i, w in enumerate(words)}
    q_vocab["UNK"] = len(words) + 1
    answers = ["black", "white", "blue", "red", "yes"]
    vocab = {
        "question_vocab": q_vocab,
        "answer_vocab": {a: i for i, a in enumerate(answers)},
        "max_question_length": 6,
    }
    with open(data_dir / "qa_v2_5answers_all.vocab.json", "w") as f:
        json.dump(vocab, f)
    make_synthetic_feature_store(
        str(data_dir / "resnet152_all"), IMAGE_IDS, num_regions=4, channels=8
    )

    cfg = Config(
        model_name=MODEL,
        q_vocab_size=q_vocab["UNK"] + 1,
        a_vocab_size=len(answers),
        max_question_length=6,
        img_feature_channel=8,
        compute_dtype="bfloat16",
    ).validate()
    params = get_model(MODEL).init(jax.random.PRNGKey(0), cfg)
    ckpt.save_weights(str(data_dir / "models" / MODEL), params)

    args = argparse.Namespace(
        model_name=MODEL, model_dir=str(data_dir / "models"),
        data_dir=str(data_dir), vocab=None, feature_type="resnet152",
        version=2, num_answer=5, batch_size=4, topk=3, max_wait_ms=30.0,
    )
    service = serve_cli.build_service(args)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_cli.make_handler(service, MODEL)
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/predict", json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:
        # surface the server's error body in the assertion message
        # (keeps .code for the tests that assert on it)
        e.msg = f"{e.msg}: {e.read().decode(errors='replace')[:500]}"
        raise


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as resp:
        got = json.loads(resp.read())
    assert got["status"] == "ok" and got["model"] == MODEL


def test_single_predict(server):
    got = _post(server, {"question": "what color is the cat", "image_id": 3})
    assert got["answer"] in {"black", "white", "blue", "red", "yes"}
    assert len(got["top"]) == 3
    probs = [t["prob"] for t in got["top"]]
    assert probs == sorted(probs, reverse=True)


def test_batched_predict_and_determinism(server):
    reqs = [
        {"question": "what color is the sky", "image_id": i}
        for i in IMAGE_IDS
    ]
    got = _post(server, {"requests": reqs})
    assert len(got["results"]) == len(IMAGE_IDS)
    again = _post(server, {"requests": reqs})
    assert [r["answer"] for r in got["results"]] == [
        r["answer"] for r in again["results"]
    ]


def test_concurrent_requests_are_microbatched_correctly(server):
    """Fire many concurrent requests: the Batcher coalesces them into
    fixed-batch engine calls; every caller must get the same answer it gets
    when asking alone."""
    solo = {
        i: _post(server, {"question": "is the dog black", "image_id": i})
        for i in IMAGE_IDS
    }
    with ThreadPoolExecutor(max_workers=8) as pool:
        futures = [
            pool.submit(
                _post, server,
                {"question": "is the dog black", "image_id": i},
            )
            for i in IMAGE_IDS * 4
        ]
        results = [f.result() for f in futures]
    for i, got in zip(IMAGE_IDS * 4, results):
        assert got["answer"] == solo[i]["answer"], i


def test_latency_telemetry_on_healthz(server):
    """After traffic, /healthz must expose request/queue/dispatch latency
    percentiles and batch occupancy (LatencyStats) — the serving-side
    observability the reference never had."""
    _post(server, {"question": "what color is the cat", "image_id": 3})
    _post(server, {"requests": [
        {"question": "what color is the sky", "image_id": i}
        for i in IMAGE_IDS
    ]})
    with urllib.request.urlopen(server + "/healthz", timeout=30) as resp:
        lat = json.loads(resp.read())["latency"]
    assert lat["requests"] >= 1 + len(IMAGE_IDS)
    assert lat["batches"] >= 2  # one micro-batched, one bulk dispatch
    for section in ("request", "dispatch"):
        p = lat[section]
        assert p["p50_ms"] is not None and p["p50_ms"] > 0
        assert p["p50_ms"] <= p["p95_ms"] <= p["p99_ms"] <= p["max_ms"]
    assert 0 < lat["batch_occupancy"] <= 1


def test_predict_image_unconfigured_is_501(server):
    """A server started without --backbone_weights keeps store-backed
    /predict working and answers /predict_image with 501, not a crash."""
    req = urllib.request.Request(
        server + "/predict_image",
        json.dumps({"question": "what", "image_b64": "aGk="}).encode(),
        {"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 501


@pytest.fixture(scope="module")
def server_img(server, tmp_path_factory):
    """A second server sharing nothing with `server` except the test data
    recipe, with a stub extractor whose grid for any input equals store
    image 3's grid — so /predict_image answers must match store-backed
    /predict for image_id 3 exactly (same batcher, same engine)."""
    import base64

    data_dir = tmp_path_factory.mktemp("serve_img_data")
    words = ["what", "color", "is", "the", "cat", "dog", "sky"]
    q_vocab = {w: i + 1 for i, w in enumerate(words)}
    q_vocab["UNK"] = len(words) + 1
    answers = ["black", "white", "blue", "red", "yes"]
    vocab = {
        "question_vocab": q_vocab,
        "answer_vocab": {a: i for i, a in enumerate(answers)},
        "max_question_length": 6,
    }
    with open(data_dir / "qa_v2_5answers_all.vocab.json", "w") as f:
        json.dump(vocab, f)
    store = make_synthetic_feature_store(
        str(data_dir / "resnet152_all"), IMAGE_IDS, num_regions=4, channels=8
    )
    cfg = Config(
        model_name=MODEL,
        q_vocab_size=q_vocab["UNK"] + 1,
        a_vocab_size=len(answers),
        max_question_length=6,
        img_feature_channel=8,
        compute_dtype="bfloat16",
    ).validate()
    params = get_model(MODEL).init(jax.random.PRNGKey(0), cfg)
    ckpt.save_weights(str(data_dir / "models" / MODEL), params)
    args = argparse.Namespace(
        model_name=MODEL, model_dir=str(data_dir / "models"),
        data_dir=str(data_dir), vocab=None, feature_type="resnet152",
        version=2, num_answer=5, batch_size=4, topk=3, max_wait_ms=5.0,
    )
    service = serve_cli.build_service(args)

    class StubExtractor:
        channels = 8
        regions = 4

        def from_bytes(self, image_bytes):
            assert image_bytes == b"fake-image"
            return np.asarray(store.gather([3], dtype=np.float16)[0],
                              np.float32)

    service.extractor = StubExtractor()
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_cli.make_handler(service, MODEL)
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_predict_image_end_to_end(server_img):
    import base64

    b64 = base64.b64encode(b"fake-image").decode()
    got = _post_path(server_img, "/predict_image",
                     {"question": "what color is the cat",
                      "image_b64": b64})
    ref = _post_path(server_img, "/predict",
                     {"question": "what color is the cat", "image_id": 3})
    assert got == ref  # same grid, same batcher/engine -> identical output


def test_bulk_mixed_store_and_image_items(server_img):
    """The bulk path accepts image_id and image_b64 items in one call;
    a b64 item whose grid equals store image 3's must answer exactly like
    the store-backed item for image 3."""
    import base64

    b64 = base64.b64encode(b"fake-image").decode()
    q = "what color is the cat"
    got = _post_path(server_img, "/predict", {"requests": [
        {"question": q, "image_id": 3},
        {"question": q, "image_b64": b64},
        {"question": q, "image_id": 7},
    ]})["results"]
    assert got[0] == got[1]  # same grid -> identical answer + top-k
    solo = _post_path(server_img, "/predict",
                      {"question": q, "image_id": 7})
    assert got[2] == solo


def test_bulk_b64_unconfigured_is_501(server):
    req = urllib.request.Request(
        server + "/predict",
        json.dumps({"requests": [
            {"question": "what", "image_b64": "aGk="}
        ]}).encode(),
        {"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 501


def test_predict_image_bad_base64_is_400(server_img):
    req = urllib.request.Request(
        server_img + "/predict_image",
        json.dumps({"question": "what", "image_b64": "!!!"}).encode(),
        {"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def _post_path(url, path, payload):
    req = urllib.request.Request(
        url + path, json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_extractor_channel_mismatch_rejected(tmp_path):
    """A backbone whose grid width differs from the store (and therefore
    from the checkpoint) must be refused at startup, not at request time."""
    data_dir = tmp_path
    words = ["what"]
    q_vocab = {"what": 1, "UNK": 2}
    vocab = {"question_vocab": q_vocab,
             "answer_vocab": {"yes": 0, "no": 1},
             "max_question_length": 6}
    with open(data_dir / "qa_v2_2answers_all.vocab.json", "w") as f:
        json.dump(vocab, f)
    store = make_synthetic_feature_store(
        str(data_dir / "resnet152_all"), [1], num_regions=4, channels=8
    )
    cfg = Config(
        model_name=MODEL, q_vocab_size=3, a_vocab_size=2,
        max_question_length=6, img_feature_channel=8,
        compute_dtype="bfloat16",
    ).validate()
    params = get_model(MODEL).init(jax.random.PRNGKey(0), cfg)

    class WrongWidth:
        channels = 512

    with pytest.raises(ValueError, match="512-channel"):
        serve_cli.VqaService(cfg, vocab, params, store, 4, 2, 0.0,
                             extractor=WrongWidth())

    class WrongRegions:  # e.g. a store extracted with a non-default --size
        channels = 8
        regions = 196

    with pytest.raises(ValueError, match="196-region"):
        serve_cli.VqaService(cfg, vocab, params, store, 4, 2, 0.0,
                             extractor=WrongRegions())


def test_prometheus_metrics_endpoint(server):
    """GET /metrics serves the same telemetry in Prometheus text format
    0.0.4 for standard scrapers."""
    _post(server, {"question": "what color is the cat", "image_id": 3})
    with urllib.request.urlopen(server + "/metrics", timeout=30) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    assert "# TYPE vqa_requests_total counter" in text
    lines = {l.split(" ")[0]: l.split(" ")[-1]
             for l in text.splitlines() if not l.startswith("#")}
    assert float(lines[f'vqa_requests_total{{model="{MODEL}"}}']) >= 1
    assert float(lines[f'vqa_batches_total{{model="{MODEL}"}}']) >= 1
    q50 = f'vqa_request_latency_ms{{model="{MODEL}",quantile="0.5"}}'
    assert q50 in lines and float(lines[q50]) > 0


def test_latency_stats_empty_and_window():
    from vqa_attention_networks_tpu.cli.serve import LatencyStats

    s = LatencyStats(window=4)
    snap = s.snapshot()
    assert snap["requests"] == 0 and snap["batches"] == 0
    assert snap["request"]["p50_ms"] is None
    assert snap["batch_occupancy"] is None

    for i in range(10):  # ring keeps the last `window` samples only
        s.record_request(0.001 * (i + 1))
    snap = s.snapshot()
    assert snap["requests"] == 10  # lifetime counter is exact
    assert snap["request"]["max_ms"] == 10.0
    assert snap["request"]["p50_ms"] >= 7.0  # window = samples 7..10


def test_error_paths(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"question": "hi", "image_id": 99999})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"image_id": 3})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        req = urllib.request.Request(server + "/nope", b"{}")
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404


def test_oversized_requests_rejected(server):
    from vqa_attention_networks_tpu.cli.serve import (
        MAX_BODY_BYTES,
        MAX_BULK_REQUESTS,
    )

    # body over the byte cap -> 413 without reading/parsing it
    big = b'{"question": "' + b"a" * MAX_BODY_BYTES + b'"}'
    req = urllib.request.Request(
        server + "/predict", big, {"Content-Type": "application/json"}
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 413

    # bulk list over the per-call cap -> 413 before any encode work
    many = {"requests": [{"question": "hi", "image_id": 1}] * (
        MAX_BULK_REQUESTS + 1)}
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, many)
    assert e.value.code == 413

    # and 'requests' must actually be a list
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"requests": "nope"})
    assert e.value.code == 400


def test_service_with_aot_artifact_matches_jit(tmp_path):
    # the AOT-loaded service must answer identically to the jit service
    from vqa_attention_networks_tpu.aot import save_serving_artifact

    data_dir = tmp_path
    words = ["what", "color", "is", "the", "cat"]
    q_vocab = {w: i + 1 for i, w in enumerate(words)}
    q_vocab["UNK"] = len(words) + 1
    answers = ["black", "white", "blue"]
    vocab = {
        "question_vocab": q_vocab,
        "answer_vocab": {a: i for i, a in enumerate(answers)},
        "max_question_length": 6,
    }
    with open(data_dir / "qa_v2_3answers_all.vocab.json", "w") as f:
        json.dump(vocab, f)
    # the AOT artifact pins the full input contract, including the
    # 196-region grid (jit would silently trace whatever region count
    # arrives; the exported graph will not)
    make_synthetic_feature_store(
        str(data_dir / "resnet152_all"), IMAGE_IDS, num_regions=196,
        channels=8,
    )
    cfg = Config(
        model_name=MODEL,
        q_vocab_size=q_vocab["UNK"] + 1,
        a_vocab_size=len(answers),
        max_question_length=6,
        img_feature_channel=8,
        compute_dtype="bfloat16",
    ).validate()
    params = get_model(MODEL).init(jax.random.PRNGKey(0), cfg)
    ckpt.save_weights(str(data_dir / "models" / MODEL), params)
    save_serving_artifact(str(data_dir / "aot"), cfg, params, 4, topk=3)

    def make_args(aot):
        return argparse.Namespace(
            model_name=MODEL, model_dir=str(data_dir / "models"),
            data_dir=str(data_dir), vocab=None, feature_type="resnet152",
            version=2, num_answer=3, batch_size=4, topk=3, max_wait_ms=1.0,
            aot_artifact=aot,
        )

    svc_jit = serve_cli.build_service(make_args(None))
    svc_aot = serve_cli.build_service(make_args(str(data_dir / "aot")))
    item = {"question": "what color is the cat", "image_id": IMAGE_IDS[0]}
    a = svc_jit.predict_one(dict(item))
    b = svc_aot.predict_one(dict(item))
    assert a["answer"] == b["answer"]
    assert [t["answer"] for t in a["top"]] == [t["answer"] for t in b["top"]]


def test_serving_encode_matches_training_alignment(server):
    # the serving encode must be the TRAINING encode (left-aligned): a
    # right-aligned layout would point the models' last-valid-timestep
    # gather (h_seq[qlen-1]) into the leading pad run
    out = _post(server,
                {"question": "what color", "image_id": IMAGE_IDS[0]})
    assert "answer" in out  # served fine
    from vqa_attention_networks_tpu.data.text import encode_question

    ids = encode_question("what color", {"what": 1, "color": 2, "UNK": 3}, 6)
    assert ids[:2] == [1, 2] and ids[2:] == [0, 0, 0, 0]


def test_bulk_requests_single_engine_call(server):
    items = [
        {"question": "what color is the cat", "image_id": IMAGE_IDS[i % 4]}
        for i in range(6)
    ]
    bulk = _post(server, {"requests": items})["results"]
    single = [_post(server, it) for it in items]
    assert len(bulk) == 6
    for a, b in zip(bulk, single):
        assert a["answer"] == b["answer"]


def test_zero_wait_dispatches_immediately(tmp_path):
    # --max_wait_ms 0 must mean "no batching delay", not "wait forever for
    # a full batch"
    import time as _time

    from vqa_attention_networks_tpu.cli.serve import Batcher
    from vqa_attention_networks_tpu.serve import InferenceEngine

    cfg = Config(
        model_name=MODEL, q_vocab_size=9, a_vocab_size=5,
        max_question_length=6, img_feature_channel=8,
        compute_dtype="bfloat16",
    ).validate()
    params = get_model(MODEL).init(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(cfg, params, batch_size=64, topk=3)
    batcher = Batcher(engine, max_wait_s=0.0)
    feats = np.zeros((4, 8), np.float16)
    ids = np.zeros((6,), np.int32)
    t0 = _time.monotonic()
    pred = batcher.submit(feats, ids, 1)
    assert pred is not None
    assert _time.monotonic() - t0 < 30  # compiles + runs; never hangs


def test_feature_cache_serves_hits(server):
    # repeated image_ids must be served from the LRU, with identical
    # results, and /healthz must expose the cache counters
    item = {"question": "what color is the sky", "image_id": IMAGE_IDS[1]}
    first = _post(server, item)
    second = _post(server, item)
    assert first == second
    with urllib.request.urlopen(server + "/healthz") as r:
        health = json.loads(r.read())
    stats = health["feature_cache"]
    assert stats["hits"] >= 1
    assert stats["entries"] >= 1


def test_feature_cache_lru_eviction_and_batched_gather(tmp_path):
    from types import SimpleNamespace

    from vqa_attention_networks_tpu.cli.serve import FeatureCache
    from vqa_attention_networks_tpu.data.feature_store import FeatureStore

    store_dir = str(tmp_path / "store")
    ids = [1, 2, 3, 4, 5]
    make_synthetic_feature_store(store_dir, ids, num_regions=4, channels=8)
    store = FeatureStore(store_dir)
    grid_bytes = 4 * 8 * 2
    cache = FeatureCache(2 * grid_bytes, grid_bytes)  # capacity 2 grids
    svc = SimpleNamespace(cache=cache, store=store, int8=False)
    svc._gather = lambda ids: serve_cli.VqaService._gather(svc, ids)

    feats = serve_cli.VqaService._features_batch(svc, [1, 2, 1, 3])
    want = store.gather([1, 2, 1, 3], dtype=np.float16)
    np.testing.assert_array_equal(np.stack(feats), want)
    assert cache.stats()["entries"] == 2  # 3 distinct ids, capacity 2

    # served-from-cache results identical to the store
    feats2 = serve_cli.VqaService._features_batch(svc, [3, 3])
    np.testing.assert_array_equal(
        np.stack(feats2), store.gather([3, 3], dtype=np.float16)
    )
    assert cache.stats()["hits"] >= 2

    # unknown id surfaces as the request-level error, not a KeyError
    with pytest.raises(ValueError, match="unknown image_id"):
        serve_cli.VqaService._features_batch(svc, [1, 999])

    # capacity 0 disables caching but must not break the path
    svc0 = SimpleNamespace(cache=FeatureCache(0, grid_bytes), store=store,
                           int8=False)
    svc0._gather = lambda ids: serve_cli.VqaService._gather(svc0, ids)
    feats3 = serve_cli.VqaService._features_batch(svc0, [4, 4, 5])
    np.testing.assert_array_equal(
        np.stack(feats3), store.gather([4, 4, 5], dtype=np.float16)
    )
    assert svc0.cache.stats()["entries"] == 0


def test_service_with_data_parallel_matches_single_device(tmp_path):
    """--data_parallel N: the sharded-engine service must return the same
    predictions as the default single-device service over identical
    artifacts (params replicated, batch split over the emulated mesh)."""
    data_dir = tmp_path / "dp_data"
    data_dir.mkdir()
    words = ["what", "color", "is", "the", "cat"]
    q_vocab = {w: i + 1 for i, w in enumerate(words)}
    q_vocab["UNK"] = len(words) + 1
    answers = ["black", "white", "blue"]
    vocab = {
        "question_vocab": q_vocab,
        "answer_vocab": {a: i for i, a in enumerate(answers)},
        "max_question_length": 6,
    }
    with open(data_dir / "qa_v2_3answers_all.vocab.json", "w") as f:
        json.dump(vocab, f)
    make_synthetic_feature_store(
        str(data_dir / "resnet152_all"), IMAGE_IDS, num_regions=4, channels=8
    )
    cfg = Config(
        model_name=MODEL, q_vocab_size=q_vocab["UNK"] + 1,
        a_vocab_size=len(answers), max_question_length=6,
        img_feature_channel=8, compute_dtype="bfloat16",
    ).validate()
    params = get_model(MODEL).init(jax.random.PRNGKey(0), cfg)
    ckpt.save_weights(str(data_dir / "models" / MODEL), params)

    def mk(dp):
        return serve_cli.build_service(argparse.Namespace(
            model_name=MODEL, model_dir=str(data_dir / "models"),
            data_dir=str(data_dir), vocab=None, feature_type="resnet152",
            version=2, num_answer=3, batch_size=8, topk=3,
            max_wait_ms=1.0, data_parallel=dp,
        ))

    single, sharded = mk(1), mk(8)
    assert sharded.engine.data_parallel == 8
    items = [
        {"image_id": i, "question": "what color is the cat"}
        for i in IMAGE_IDS
    ]
    a = single.predict_many(items)
    b = sharded.predict_many(items)
    for x, y in zip(a, b):
        assert x["answer"] == y["answer"]
        assert [t["answer"] for t in x["top"]] == [
            t["answer"] for t in y["top"]
        ]


@pytest.fixture(scope="module")
def server_bank(tmp_path_factory):
    """Two services over the SAME int8 store — one with the device bank
    (--device_cache_images), one without — plus the bank one served over
    HTTP. The int8 per-request feed and the bank's in-graph gather read
    identical quantized rows, so answers must match exactly."""
    from vqa_attention_networks_tpu.data.feature_store import quantize_store

    data_dir = tmp_path_factory.mktemp("serve_bank")
    words = ["what", "color", "is", "the", "cat", "dog", "sky"]
    q_vocab = {w: i + 1 for i, w in enumerate(words)}
    q_vocab["UNK"] = len(words) + 1
    answers = ["black", "white", "blue", "red", "yes"]
    vocab = {
        "question_vocab": q_vocab,
        "answer_vocab": {a: i for i, a in enumerate(answers)},
        "max_question_length": 6,
    }
    with open(data_dir / "qa_v2_5answers_all.vocab.json", "w") as f:
        json.dump(vocab, f)
    make_synthetic_feature_store(
        str(data_dir / "resnet152_f16"), IMAGE_IDS, num_regions=4,
        channels=8,
    )
    quantize_store(str(data_dir / "resnet152_f16"),
                   str(data_dir / "resnet152_all"))

    cfg = Config(
        model_name=MODEL,
        q_vocab_size=q_vocab["UNK"] + 1,
        a_vocab_size=len(answers),
        max_question_length=6,
        img_feature_channel=8,
        compute_dtype="bfloat16",
    ).validate()
    params = get_model(MODEL).init(jax.random.PRNGKey(0), cfg)
    ckpt.save_weights(str(data_dir / "models" / MODEL), params)

    def build(device_cache_images):
        args = argparse.Namespace(
            model_name=MODEL, model_dir=str(data_dir / "models"),
            data_dir=str(data_dir), vocab=None, feature_type="resnet152",
            version=2, num_answer=5, batch_size=4, topk=3,
            max_wait_ms=30.0, device_cache_images=device_cache_images,
        )
        return serve_cli.build_service(args)

    service_bank = build(len(IMAGE_IDS))
    service_plain = build(0)
    assert service_bank.bank is not None
    assert service_plain.bank is None

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve_cli.make_handler(service_bank, MODEL)
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield (f"http://127.0.0.1:{httpd.server_address[1]}",
           service_bank, service_plain)
    httpd.shutdown()


def test_device_bank_http_matches_plain_int8_service(server_bank):
    url, service_bank, service_plain = server_bank
    for image_id in IMAGE_IDS:
        item = {"image_id": image_id, "question": "what color is the cat"}
        got = _post(url, item)
        want = service_plain.predict_one(dict(item))
        assert got["answer"] == want["answer"]
        assert [t["answer"] for t in got["top"]] == \
            [t["answer"] for t in want["top"]]
    # repeat traffic is served from the bank, not re-fetched
    _post(url, {"image_id": IMAGE_IDS[0],
                "question": "what color is the cat"})
    assert service_bank.bank.hits > 0
    assert service_bank.bank.misses <= len(IMAGE_IDS)


def test_device_bank_bulk_mixed_order_preserved(server_bank):
    url, service_bank, service_plain = server_bank
    items = [
        {"image_id": i, "question": q}
        for i, q in zip(
            [IMAGE_IDS[2], IMAGE_IDS[0], IMAGE_IDS[3], IMAGE_IDS[1],
             IMAGE_IDS[2]],
            ["what color is the cat", "is the sky blue",
             "what is the dog", "what color is the sky",
             "is the cat black"],
        )
    ]
    got = _post(url, {"requests": items})["results"]
    want = [service_plain.predict_one(dict(it)) for it in items]
    assert [g["answer"] for g in got] == [w["answer"] for w in want]


def test_device_bank_unknown_image_id_is_400(server_bank):
    url, _, _ = server_bank
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, {"image_id": 9999, "question": "what is this"})
    assert e.value.code == 400


def test_device_bank_metrics_exported(server_bank):
    url, _, _ = server_bank
    with urllib.request.urlopen(url + "/metrics", timeout=30) as resp:
        body = resp.read().decode()
    assert "vqa_device_bank_hits_total" in body
    assert "vqa_device_bank_evictions_total" in body


def test_device_bank_sharded_over_data_parallel_mesh(tmp_path):
    """--data_parallel D + --device_cache_images: the bank shards over the
    serving mesh (DeviceFeatureCache(mesh=...), r5) — answers must equal
    the plain single-device int8 service's, and capacity rounds up to a
    mesh multiple."""
    from vqa_attention_networks_tpu.data.feature_store import quantize_store

    data_dir = tmp_path
    words = ["what", "color", "is", "the", "cat"]
    q_vocab = {w: i + 1 for i, w in enumerate(words)}
    q_vocab["UNK"] = len(words) + 1
    vocab = {"question_vocab": q_vocab,
             "answer_vocab": {"black": 0, "white": 1, "blue": 2},
             "max_question_length": 6}
    with open(data_dir / "qa_v2_3answers_all.vocab.json", "w") as f:
        json.dump(vocab, f)
    make_synthetic_feature_store(
        str(data_dir / "resnet152_f16"), IMAGE_IDS, num_regions=4,
        channels=8,
    )
    quantize_store(str(data_dir / "resnet152_f16"),
                   str(data_dir / "resnet152_all"))
    cfg = Config(
        model_name=MODEL, q_vocab_size=q_vocab["UNK"] + 1, a_vocab_size=3,
        max_question_length=6, img_feature_channel=8,
        compute_dtype="bfloat16",
    ).validate()
    params = get_model(MODEL).init(jax.random.PRNGKey(0), cfg)
    ckpt.save_weights(str(data_dir / "models" / MODEL), params)

    def build(device_cache_images, data_parallel):
        args = argparse.Namespace(
            model_name=MODEL, model_dir=str(data_dir / "models"),
            data_dir=str(data_dir), vocab=None, feature_type="resnet152",
            version=2, num_answer=3, batch_size=8, topk=2, max_wait_ms=0.0,
            device_cache_images=device_cache_images,
            data_parallel=data_parallel,
        )
        return serve_cli.build_service(args)

    ndev = jax.device_count()
    sharded = build(len(IMAGE_IDS), ndev)  # 4 images -> rounds up to ndev
    plain = build(0, 1)
    assert sharded.bank is not None
    assert sharded.bank.capacity == ndev
    assert len(sharded.bank.rows.sharding.device_set) == ndev
    for image_id in IMAGE_IDS + [IMAGE_IDS[0]]:  # repeat: a bank hit
        item = {"image_id": image_id, "question": "what color is the cat"}
        got = sharded.predict_one(dict(item))
        want = plain.predict_one(dict(item))
        assert got["answer"] == want["answer"]
        assert [t["answer"] for t in got["top"]] == \
            [t["answer"] for t in want["top"]]
    assert sharded.bank.hits >= 1


def test_device_bank_requires_int8_store(tmp_path):
    """A float store + --device_cache_images must refuse at startup."""
    data_dir = tmp_path
    words = ["what"]
    q_vocab = {"what": 1, "UNK": 2}
    vocab = {"question_vocab": q_vocab,
             "answer_vocab": {"yes": 0, "no": 1},
             "max_question_length": 6}
    with open(data_dir / "qa_v2_2answers_all.vocab.json", "w") as f:
        json.dump(vocab, f)
    make_synthetic_feature_store(
        str(data_dir / "resnet152_all"), IMAGE_IDS, num_regions=4,
        channels=8,
    )
    cfg = Config(
        model_name=MODEL, q_vocab_size=3, a_vocab_size=2,
        max_question_length=6, img_feature_channel=8,
        compute_dtype="bfloat16",
    ).validate()
    params = get_model(MODEL).init(jax.random.PRNGKey(0), cfg)
    ckpt.save_weights(str(data_dir / "models" / MODEL), params)
    args = argparse.Namespace(
        model_name=MODEL, model_dir=str(data_dir / "models"),
        data_dir=str(data_dir), vocab=None, feature_type="resnet152",
        version=2, num_answer=2, batch_size=4, topk=2, max_wait_ms=0.0,
        device_cache_images=8,
    )
    with pytest.raises(ValueError, match="int8"):
        serve_cli.build_service(args)
