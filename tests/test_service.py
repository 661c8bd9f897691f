"""Micro-batching inference service tests."""

import threading

import numpy as np
import pytest
import jax

from tpudf.calib.coral import CoralCutpoints
from tpudf.core.precision import F32_POLICY
from tpudf.models.freq_mlp import init_freq_mlp
from tpudf.models.fusion import init_fusion_linear
from tpudf.models.heads import init_binary_head
from tpudf.models.siglip import CONFIGS, init_siglip
from tpudf.serve.engine import DetectEngine
from tpudf.serve.service import DetectService


@pytest.fixture(scope="module")
def service():
    cfg = CONFIGS["test-32"]
    k = jax.random.split(jax.random.key(0), 4)
    engine = DetectEngine(cfg=cfg, backbone=init_siglip(k[0], cfg),
                          head=init_binary_head(k[1], cfg.width),
                          freq=init_freq_mlp(k[2]),
                          fusion=init_fusion_linear(k[3]),
                          cuts=CoralCutpoints.default(), policy=F32_POLICY)
    svc = DetectService(engine, max_batch=8, max_wait_ms=30)
    yield svc
    svc.close()


def test_concurrent_requests_batched(service):
    rng = np.random.default_rng(0)
    results = {}

    def call(i):
        px = rng.integers(0, 256, (32, 32, 3), np.uint8)
        results[i] = service.predict(px, fast=True, timeout=300)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 6
    for r in results.values():
        assert "final_label" in r
    stats = service.snapshot_stats()
    assert stats["requests"] >= 6
    # micro-batching actually grouped some requests
    assert stats["mean_batch_size"] >= 1.0


def test_single_full_request(service):
    px = np.random.default_rng(1).integers(0, 256, (32, 32, 3), np.uint8)
    r = service.predict(px, fast=False, timeout=300)
    assert "patch_probs" in r


def test_pad_to_bucket():
    from tpudf.serve.report import pad_to_bucket
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (5, 32, 32, 3), np.uint8)
    padded = pad_to_bucket(px)
    assert padded.shape[0] == 8
    np.testing.assert_array_equal(padded[:5], px)
    np.testing.assert_array_equal(padded[5], px[4])   # repeats last image
    for b in (1, 2, 4, 8):                            # pow2 stays put
        assert pad_to_bucket(px[:b]).shape[0] == b
    assert pad_to_bucket(px[:3], max_batch=2).shape[0] == 3   # cap respected
    # non-pow2 serving cap: a full drain pads to exactly max_batch (the
    # graph warmup() compiles), never past it
    px6 = rng.integers(0, 256, (5, 32, 32, 3), np.uint8)
    assert pad_to_bucket(px6, max_batch=6).shape[0] == 6
    assert pad_to_bucket(px6[:3], max_batch=6).shape[0] == 4


def test_warmup_covers_nonpow2_cap():
    """DetectService.warmup compiles the exact max_batch bucket the worker
    pads full drains to (dispatch_images max_batch cap)."""
    sizes = []

    class _FakeCfg:
        image_size = 32

    class _FakeEngine:
        cfg = _FakeCfg()

    svc = DetectService.__new__(DetectService)   # no worker thread
    svc.engine = _FakeEngine()
    svc.max_batch = 6
    import tpudf.serve.report as report_mod
    orig = report_mod.predict_images
    report_mod.predict_images = lambda eng, px, fast=False: sizes.append(
        px.shape[0])
    try:
        svc.warmup()
    finally:
        report_mod.predict_images = orig
    assert sizes == [1, 2, 4, 6]


def test_padded_dispatch_matches_unpadded(service):
    """Bucket padding must not change any report for the real images."""
    from tpudf.serve.report import dispatch_images, predict_images
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (3, 32, 32, 3), np.uint8)
    plain = predict_images(service.engine, px, fast=True)
    fut = dispatch_images(service.engine, px, fast=True, pad_batch=True)
    padded = predict_images(service.engine, px, fast=True, _dispatched=fut)
    assert len(padded) == 3
    for a, b in zip(plain, padded):
        assert a["p_fake_raw"] == pytest.approx(b["p_fake_raw"], abs=1e-5)
        assert a["final_label"] == b["final_label"]


def test_burst_arrivals_no_starvation(service):
    """Queue-starvation regression (r3 verdict item 7): a burst of
    3x max_batch simultaneous fast requests plus one interleaved FULL
    request — every request completes, the full request is not starved by
    the continuing fast stream, and the tail is bounded (percentile stats
    exposed by snapshot_stats)."""
    n_burst = 3 * service.max_batch
    done = {}
    lock = threading.Lock()

    def fast_call(i):
        # per-thread generator: np Generators are not thread-safe, and
        # ~96 threads sharing one risks corrupted buffers (ADVICE r4)
        px = np.random.default_rng(i).integers(0, 256, (32, 32, 3),
                                               np.uint8)
        r = service.predict(px, fast=True, timeout=300)
        with lock:
            done[i] = r

    threads = [threading.Thread(target=fast_call, args=(i,))
               for i in range(n_burst)]
    for t in threads[:n_burst // 2]:
        t.start()
    # full request lands mid-burst; the rest of the burst keeps arriving
    import time
    full_box = {}

    def full_call():
        px = np.random.default_rng(n_burst).integers(0, 256, (32, 32, 3),
                                                     np.uint8)
        t0 = time.perf_counter()
        full_box["report"] = service.predict(px, fast=False, timeout=300)
        full_box["latency"] = time.perf_counter() - t0

    ft = threading.Thread(target=full_call)
    ft.start()
    for t in threads[n_burst // 2:]:
        t.start()
    for t in threads:
        t.join()
    ft.join()

    assert len(done) == n_burst
    assert "patch_probs" in full_box["report"], "full request starved"
    stats = service.snapshot_stats()
    assert "p50_latency_s" in stats and "p99_latency_s" in stats
    # the full request must not wait out the whole burst: it rides one of
    # the first batches after arrival (generous bound: half the burst's
    # wall time, not after all fast traffic)
    assert full_box["latency"] < max(stats["p99_latency_s"] * 3.0, 60.0)
