"""Serving-layer benchmark: sustained throughput + request latency.

Drives serve/service.DetectService (micro-batching queue + double-buffered
dispatch) with concurrent client threads against the deployed base-256
int8+ToMe engine on the real chip, and reports sustained img/s and
p50/p90/p99 request latency — the serving-shape numbers behind
BASELINE.json's metric string. The reference serves one request at a time
through Gradio (appv3.py:6404-6457) with no batching at all.

Two modes:
  * closed-loop (default): M client threads, back-to-back requests —
    sustained throughput ceiling.
  * open-loop (--sweep "rps,rps,..."): Poisson arrivals at each offered
    rate — the p50/p99-vs-load SLO curve a capacity planner needs
    (requests are fired on schedule regardless of completions, so queueing
    delay shows up instead of being absorbed by client back-pressure).

Usage: python scripts/bench_service.py [--fast] [--requests N] [--clients M]
       python scripts/bench_service.py --fast --sweep 500,1000,2000,4000
"""
import argparse
import sys
import threading
import time

sys.path[:0] = ["/root/repo", "/root/repo/scripts"]

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="fast reports (video-frame path, no patch grid)")
    ap.add_argument("--requests", type=int, default=512,
                    help="total requests across all clients")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--max_batch", type=int, default=64)
    ap.add_argument("--sweep", default=None,
                    help="comma-separated offered loads (requests/sec) for "
                         "the open-loop Poisson mode")
    args = ap.parse_args()

    from tpudf.calib.coral import CoralCutpoints
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models.freq_mlp import init_freq_mlp
    from tpudf.models.fusion import init_fusion_linear
    from tpudf.models.heads import init_binary_head
    from tpudf.models.siglip import CONFIGS, init_siglip
    from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor
    from tpudf.serve.engine import DetectEngine
    from tpudf.serve.service import DetectService

    cfg = CONFIGS["base-256"]
    ks = jax.random.split(jax.random.key(0), 4)
    s0 = cfg.num_patches
    eng = DetectEngine(cfg=cfg, backbone=init_siglip(ks[0], cfg),
                       head=init_binary_head(ks[1], cfg.width),
                       freq=init_freq_mlp(ks[2]),
                       fusion=init_fusion_linear(ks[3]),
                       cuts=CoralCutpoints.default(), policy=DEFAULT_POLICY,
                       tome_r=DEPLOYED_TOME_R, tome_floor=deployed_floor(s0))
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (16, 256, 256, 3), np.uint8)
    eng.quantize(calib)

    svc = DetectService(eng, max_batch=args.max_batch, max_wait_ms=5.0)
    svc.warmup(fast=args.fast)        # compile every pow2 batch bucket
    img = rng.integers(0, 256, (256, 256, 3), np.uint8)
    svc.predict(img, fast=args.fast, timeout=900.0)

    if args.sweep:
        _open_loop_sweep(svc, args, rng)
        svc.close()
        return

    per_client = args.requests // args.clients
    lats = []
    lock = threading.Lock()

    def client(seed):
        r = np.random.default_rng(seed)
        mine = []
        for _ in range(per_client):
            px = r.integers(0, 256, (256, 256, 3), np.uint8)
            t0 = time.perf_counter()
            svc.predict(px, fast=args.fast, timeout=120.0)
            mine.append(time.perf_counter() - t0)
        with lock:
            lats.extend(mine)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    svc.close()

    lats = np.sort(np.asarray(lats))
    n = len(lats)
    stats = svc.snapshot_stats()
    print({
        "mode": "fast" if args.fast else "full",
        "requests": n,
        "clients": args.clients,
        "sustained_img_s": round(n / wall, 1),
        "p50_ms": round(1e3 * lats[n // 2], 2),
        "p90_ms": round(1e3 * lats[int(n * 0.9)], 2),
        "p99_ms": round(1e3 * lats[int(n * 0.99)], 2),
        "mean_batch": round(stats.get("mean_batch_size", 0), 1),
    })


def _open_loop_sweep(svc, args, rng):
    """Poisson arrivals at each offered rate; p50/p99 include queueing."""
    img_pool = [rng.integers(0, 256, (256, 256, 3), np.uint8)
                for _ in range(32)]
    for rate in [float(r) for r in args.sweep.split(",")]:
        n = max(int(min(args.requests, rate * 4)), 64)   # ~4 s of traffic
        lats, errs = [], [0]
        lock = threading.Lock()
        done = threading.Semaphore(0)

        def fire(px):
            t0 = time.perf_counter()
            try:
                svc.predict(px, fast=args.fast, timeout=120.0)
                with lock:
                    lats.append(time.perf_counter() - t0)
            except Exception:
                with lock:
                    errs[0] += 1
            done.release()

        arr = np.random.default_rng(int(rate)).exponential(1.0 / rate, n)
        t_next = time.perf_counter()
        for i in range(n):
            t_next += arr[i]
            delay = t_next - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            threading.Thread(target=fire, args=(img_pool[i % 32],),
                             daemon=True).start()
        for _ in range(n):
            done.acquire()
        ls = np.sort(np.asarray(lats))
        m = len(ls)
        print({
            "mode": "fast" if args.fast else "full",
            "offered_rps": rate, "requests": n, "errors": errs[0],
            "p50_ms": round(1e3 * ls[m // 2], 2),
            "p99_ms": round(1e3 * ls[min(m - 1, int(m * 0.99))], 2),
            "mean_batch": round(
                svc.snapshot_stats().get("mean_batch_size", 0), 1),
        })


if __name__ == "__main__":
    main()
