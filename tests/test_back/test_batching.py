"""Micro-batching: correctness under concurrency, error propagation."""

import threading
import time

import numpy as np

from clip_retrieval_tpu.back.batching import MicroBatcher


def test_batches_aggregate():
    seen_batches = []

    def fn(payloads):
        seen_batches.append(len(payloads))
        return [p * 2 for p in payloads]

    mb = MicroBatcher(fn, max_batch=16, max_wait_ms=30)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(12) as ex:
        results = list(ex.map(mb.submit, range(12)))
    assert results == [i * 2 for i in range(12)]
    assert max(seen_batches) > 1  # concurrency actually batched


def test_single_request_latency_bounded():
    mb = MicroBatcher(lambda ps: ps, max_batch=64, max_wait_ms=10)
    t0 = time.perf_counter()
    assert mb.submit("x") == "x"
    assert time.perf_counter() - t0 < 0.5


def test_error_propagates_per_item():
    def fn(payloads):
        raise ValueError("boom")

    mb = MicroBatcher(fn, max_batch=4, max_wait_ms=1)
    import pytest

    with pytest.raises(ValueError, match="boom"):
        mb.submit(1)
    # batcher still alive for later submissions
    with pytest.raises(ValueError, match="boom"):
        mb.submit(2)


def test_encoder_batching_results_match_serial():
    """Concurrent text encodes through _Encoders equal the serial results."""
    from clip_retrieval_tpu.back.knn import _Encoders
    from clip_retrieval_tpu.models import zoo

    bundle = zoo.load_model("test-tiny")
    enc = _Encoders(bundle, max_batch=8, max_wait_ms=20)
    texts = [f"text number {i}" for i in range(10)]
    serial = [enc.text(t) for t in texts]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(10) as ex:
        parallel = list(ex.map(enc.text, texts))
    for s, p in zip(serial, parallel):
        np.testing.assert_allclose(s, p, atol=1e-5)


def test_warm_precompiles_bucket_programs():
    """warm() compiles one program per bucket; traffic that fits an existing
    bucket then never triggers a new compile."""
    from clip_retrieval_tpu.back.knn import _Encoders
    from clip_retrieval_tpu.models import zoo

    bundle = zoo.load_model("test-tiny")
    enc = _Encoders(bundle, max_batch=8, max_wait_ms=5)
    enc.warm((1, 4))
    text_cache = enc._encode_text._cache_size()
    img_cache = enc._encode_image._cache_size()
    assert text_cache == 2 and img_cache == 2
    # a single-item encode pads to the pre-compiled bucket-1 program
    out = enc.text("hello")
    assert out.shape[0] == 1
    assert enc._encode_text._cache_size() == text_cache


def test_warm_buckets_from_env(monkeypatch):
    from clip_retrieval_tpu.back.app import warm_buckets_from_env

    monkeypatch.delenv("CRT_WARM_BUCKETS", raising=False)
    assert warm_buckets_from_env() == (1, 64)
    monkeypatch.setenv("CRT_WARM_BUCKETS", "2,8,32")
    assert warm_buckets_from_env() == (2, 8, 32)
    monkeypatch.setenv("CRT_WARM_BUCKETS", "")
    assert warm_buckets_from_env() == ()
    # malformed entries are skipped, never crash boot
    monkeypatch.setenv("CRT_WARM_BUCKETS", "1,64,")
    assert warm_buckets_from_env() == (1, 64)
    monkeypatch.setenv("CRT_WARM_BUCKETS", "1,bogus,8")
    assert warm_buckets_from_env() == (1, 8)
    # fully-malformed value falls back to the default, never disables warmup
    monkeypatch.setenv("CRT_WARM_BUCKETS", "1;64")
    assert warm_buckets_from_env() == (1, 64)


def test_warm_clamps_buckets_to_max_batch():
    """Buckets above max_batch can never be dispatched; warm() must not
    compile programs for them."""
    from clip_retrieval_tpu.back.knn import _Encoders
    from clip_retrieval_tpu.models import zoo

    bundle = zoo.load_model("test-tiny")
    enc = _Encoders(bundle, max_batch=4, max_wait_ms=5)
    enc.warm((1, 64))  # 64 > max_batch → clamps to bucket(4) = 4
    assert enc._encode_text._cache_size() == 2  # programs for 1 and 4 only


def test_warm_rounds_to_dispatch_buckets():
    """Warming a non-power-of-2 size must compile the pow2 bucket the
    batcher actually dispatches, not the raw requested shape."""
    from clip_retrieval_tpu.back.knn import _Encoders, _bucket
    from clip_retrieval_tpu.models import zoo

    assert _bucket(48) == 64 and _bucket(1) == 1 and _bucket(64) == 64
    bundle = zoo.load_model("test-tiny")
    enc = _Encoders(bundle, max_batch=48, max_wait_ms=5)
    enc.warm((48,))  # dispatch shape for 48 requests is bucket(48) = 64
    assert enc._encode_text._cache_size() == 1
    # a 3-item burst pads to bucket 4 -> new program (not warmed); but a
    # 33..48 burst pads to 64 which IS warm
    out = enc.text("x")
    assert out.shape[0] == 1


def test_batch_fn_length_mismatch_raises():
    """A batch fn returning the wrong count must error loudly, not resolve
    surplus waiters to None."""
    import pytest

    mb = MicroBatcher(lambda ps: ps[:-1] if len(ps) > 1 else ps,
                      max_batch=8, max_wait_ms=30, name="short")
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(6) as ex:
        futures = [ex.submit(mb.submit, i) for i in range(6)]
        outcomes = []
        for f in futures:
            try:
                outcomes.append(("ok", f.result()))
            except RuntimeError as e:
                outcomes.append(("err", str(e)))
    # single-item batches pass through; any multi-item batch errors loudly
    assert all(o == ("ok", i) or "results for" in o[1]
               for i, o in enumerate(outcomes))
    assert not any(o == ("ok", None) for o in outcomes)


def test_pipelined_dispatch_finish_results_and_stats():
    """Two-stage batcher: per-item results correct, counters advance."""
    def dispatch(payloads):
        return [p * 2 for p in payloads]  # 'handle' = computed values

    def finish(handle, n):
        assert len(handle) == n
        return handle

    mb = MicroBatcher(dispatch, max_batch=8, max_wait_ms=20,
                      name="pipe", fn_finish=finish)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(12) as ex:
        results = list(ex.map(mb.submit, range(12)))
    assert results == [i * 2 for i in range(12)]
    assert mb.n_items == 12 and 2 <= mb.n_batches <= 12


def test_pipelined_overlaps_dispatch_with_finish():
    """While batch N materializes (finish blocked), batch N+1 must still be
    DISPATCHED — that overlap is the whole point of the two-stage design."""
    gate = threading.Event()
    dispatched = []

    def dispatch(payloads):
        dispatched.append(list(payloads))
        return payloads

    def finish(handle, n):
        if dispatched and dispatched[0] == handle:
            # first batch: block in finish until the test observes overlap
            assert gate.wait(5)
        return list(handle)

    mb = MicroBatcher(dispatch, max_batch=1, max_wait_ms=1,
                      name="overlap", fn_finish=finish)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(mb.submit, "a")
        f2 = ex.submit(mb.submit, "b")
        t0 = time.perf_counter()
        while len(dispatched) < 2 and time.perf_counter() - t0 < 5:
            time.sleep(0.005)
        # batch 2 dispatched while batch 1 is stuck in finish
        assert len(dispatched) == 2
        gate.set()
        assert sorted([f1.result(), f2.result()]) == ["a", "b"]


def test_pipelined_errors_propagate_per_stage():
    """A dispatch error and a finish error both reach the right waiters and
    leave the batcher alive."""
    import pytest

    def dispatch(payloads):
        if payloads[0] == "bad-dispatch":
            raise ValueError("dispatch boom")
        return payloads

    def finish(handle, n):
        if handle[0] == "bad-finish":
            raise ValueError("finish boom")
        return list(handle)

    mb = MicroBatcher(dispatch, max_batch=1, max_wait_ms=1,
                      name="pipe-err", fn_finish=finish)
    with pytest.raises(ValueError, match="dispatch boom"):
        mb.submit("bad-dispatch")
    with pytest.raises(ValueError, match="finish boom"):
        mb.submit("bad-finish")
    assert mb.submit("ok") == "ok"


def test_concurrent_first_requests_build_one_encoder_set():
    """The check-then-insert on KnnService._encoders is locked: concurrent
    first requests must share ONE _Encoders (a duplicate would leak a
    device-resident params copy)."""
    from concurrent.futures import ThreadPoolExecutor
    from types import SimpleNamespace

    from clip_retrieval_tpu.back.knn import KnnService
    from clip_retrieval_tpu.models import zoo

    bundle = zoo.load_model("test-tiny")
    svc = KnnService({"a": SimpleNamespace(bundle=bundle)})
    with ThreadPoolExecutor(12) as ex:
        encs = list(ex.map(lambda _: svc._enc("a"), range(12)))
    assert all(e is encs[0] for e in encs)
