"""Serving-daemon soak: sustained offered load, watching for leaks.

scripts/soak_train.py covers the trainer (it caught the checkpoint-
rotation restart bug); this is the serving analog: drive the
micro-batching daemon at saturation for N minutes and watch host RSS,
error counts, and throughput drift — the failure modes a 45 s bench
window cannot see (queue/jit-cache growth, thread leaks, wav buffer
accumulation).

Run on the TPU:  python scripts/soak_serve.py [--minutes 10]
Prints one JSON line; exit 1 on errors or RSS growth > threshold.
"""

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_serve import SENTENCES  # same workload as the bench


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--clients", type=int, default=8)
    args = ap.parse_args()

    from bench import build_pipeline
    from matcha_tpu.serve import BatchingServer

    pipeline = build_pipeline()
    pipeline.cleaner = "english_cleaners_no_espeak"
    batcher = BatchingServer(pipeline, max_batch=8, batch_window_ms=10.0,
                             n_timesteps=10, default_rate=3.5)
    print("warming...", flush=True)
    batcher.warmup([(128, 1024), (192, 1024)])
    for s in SENTENCES:
        batcher.submit(s, timeout_s=1200.0)

    LONG_TEXT = " ".join(SENTENCES[:4])
    stop = time.perf_counter() + args.minutes * 60.0
    errors, n_done = [], [0]
    lock = threading.Lock()

    def client(ci):
        rng = np.random.default_rng(ci)
        while time.perf_counter() < stop:
            try:
                if ci == 0:
                    for r in batcher.submit_stream(LONG_TEXT, max_chars=80,
                                                   timeout_s=1200.0):
                        if r.error:
                            raise RuntimeError(r.error)
                else:
                    r = batcher.submit(SENTENCES[rng.integers(0, len(SENTENCES))],
                                       timeout_s=1200.0)
                    if r.error:
                        raise RuntimeError(r.error)
                with lock:
                    n_done[0] += 1
            except Exception as e:  # record, keep soaking
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")
                time.sleep(0.5)

    import jax

    rss0 = rss_mb()
    t0 = time.perf_counter()
    samples = [(0.0, rss0)]
    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(args.clients)]
    for t in threads:
        t.start()
    while any(t.is_alive() for t in threads):
        time.sleep(30)
        samples.append(((time.perf_counter() - t0) / 60.0, rss_mb()))
        # live_arrays distinguishes a device-buffer retention leak (ours)
        # from host allocator churn / tunnel-client growth (not ours)
        print(f"  t={samples[-1][0]:.1f}min rss={samples[-1][1]:.0f}MB "
              f"live_arrays={len(jax.live_arrays())} "
              f"done={n_done[0]} errs={len(errors)}", flush=True)
    for t in threads:
        t.join()
    wall_min = (time.perf_counter() - t0) / 60.0

    rss1 = samples[-1][1]
    # steady-state growth: skip the first minute (allocator arenas settle
    # after the last warm compiles; extrapolating that one-off to MB/h
    # false-positived a leak-free run)
    base_i = min(2, len(samples) - 1)
    base_t, base_rss = samples[base_i]
    growth_per_h = ((rss1 - base_rss)
                    / max((wall_min - base_t) / 60.0, 1e-9))
    result = {
        "minutes": round(wall_min, 1),
        "requests_done": n_done[0],
        "req_per_s": round(n_done[0] / (wall_min * 60.0), 1),
        "errors": len(errors),
        "first_errors": errors[:3],
        "rss_start_mb": round(rss0, 1),
        "rss_end_mb": round(rss1, 1),
        "rss_growth_mb_per_h": round(growth_per_h, 1),
        "queue_depth_end": batcher._q.qsize(),
        "in_flight_end": batcher._in_flight,
    }
    print(json.dumps(result), flush=True)
    batcher.shutdown()
    # fail on errors or runaway growth (JIT caches stabilize after warm;
    # steady-state growth means a real leak)
    return 1 if (errors or growth_per_h > 300.0) else 0


if __name__ == "__main__":
    sys.exit(main())
