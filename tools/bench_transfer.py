#!/usr/bin/env python
"""Host->device transfer taxonomy (the e2e-vs-bench gap).

The production loop ships one uint8 image batch per iteration
(256px B16 = 3.15 MB; 1024px B16 = 48 MB). bench.py keeps a device-resident
batch, so any difference between bench and e2e rates is loader + transfer +
scheduling. Round 5 established that this transport has FOUR distinct put
regimes, and the round-4 "busy vs idle" model was the wrong axis:

  * pre-fetch  idle: ~800 MB/s    (fresh process, nothing fetched yet)
  * pre-fetch  busy: ~800 MB/s    (no busy penalty at all pre-fetch)
  * post-fetch idle: ~11-28 MB/s  (after the FIRST device->host fetch of a
                                   computed result the connection drops to
                                   a ~1 MB-per-rtt synchronous mode and
                                   never recovers in-process; varies with
                                   relay load by hour)
  * post-fetch busy: ~10-17 MB/s

Every real training loop fetches metrics, so the production regimes are the
post-fetch pair — they are what train/loop.py's put-mode wall model
(decide_put_mode) consumes, and what this tool measures the way the loop's
own probes do (train/loop.py:put_probe — 64 MB incompressible, median of
3). Prints one JSON line; docs/ROUND5_NOTES.md records the measured values.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_put(x):
    import jax

    t0 = time.perf_counter()
    y = jax.device_put(x)
    y.block_until_ready()
    return time.perf_counter() - t0, y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")

    from content_aware_gan_compression_tpu.train.loop import put_probe

    rng = np.random.default_rng(0)
    shape = (args.batch_size, args.size, args.size, 3)
    mb = np.prod(shape) / 2**20
    wshape = (args.window,) + shape
    wmb = np.prod(wshape) / 2**20

    # ---- regime 1: pre-fetch idle (fresh process, nothing computed) ------
    put_s = []
    for _ in range(args.reps):
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        dt, y = timed_put(x)
        put_s.append(dt)
        del y
    x = rng.integers(0, 256, wshape, dtype=np.uint8)
    wdt, _ = timed_put(x)
    prefetch_idle = put_probe()

    # a ~2.5 s compute window (the K-window regime, not a 0.2 s blip);
    # compile + warm WITHOUT a host fetch (block_until_ready only) so the
    # pre-fetch regimes stay clean
    n = 8192
    a = jax.device_put(rng.standard_normal((n, n)).astype(np.float32))
    heavy = jax.jit(lambda a: jnp.float32(jax.lax.fori_loop(
        0, 400, lambda i, y: y @ y * (1.0 / n), a.astype(jnp.bfloat16))[0, 0]))
    heavy(a).block_until_ready()

    # ---- regime 2: pre-fetch busy ----------------------------------------
    r = heavy(a)
    prefetch_busy = put_probe()
    r.block_until_ready()

    # ---- the first fetch: flips the transport for the rest of the process
    float(r)

    # compute window length, fenced by a scalar fetch (the relay's
    # block_until_ready is lax for compute results — CLAUDE.md)
    t0 = time.perf_counter()
    float(heavy(a))
    compute_s = time.perf_counter() - t0

    # ---- regime 3: post-fetch idle (what serial staging gets) ------------
    postfetch_idle = put_probe()
    x = rng.integers(0, 256, wshape, dtype=np.uint8)
    wdt_post, _ = timed_put(x)

    # ---- regime 4: post-fetch busy (what overlap staging gets) -----------
    r = heavy(a)
    postfetch_busy = put_probe()
    float(r)

    med = lambda s: float(np.median(s))  # noqa: E731
    print(json.dumps({
        "metric": "host_to_device_transfer",
        "batch_mb": round(float(mb), 2),
        "window_mb": round(float(wmb), 2),
        "compute_s": round(compute_s, 3),
        # regime 1
        "prefetch_idle_batch_put_s": round(med(put_s), 4),
        "prefetch_idle_batch_bw_mb_s": round(float(mb) / med(put_s), 1),
        "prefetch_idle_window_put_s": round(wdt, 3),
        "prefetch_idle_window_bw_mb_s": round(float(wmb) / wdt, 1),
        "prefetch_idle_probe_bw_mb_s": round(64 / med(prefetch_idle), 1),
        # regime 2
        "prefetch_busy_probe_bw_mb_s": round(64 / med(prefetch_busy), 1),
        # regime 3 — serial staging's production rate
        "postfetch_idle_probe_bw_mb_s": round(64 / med(postfetch_idle), 1),
        "postfetch_idle_window_put_s": round(wdt_post, 3),
        "postfetch_idle_window_bw_mb_s": round(float(wmb) / wdt_post, 1),
        # regime 4 — overlap staging's production rate
        "postfetch_busy_probe_bw_mb_s": round(64 / med(postfetch_busy), 1),
        "probe_samples_s": {
            "prefetch_idle": [round(t, 4) for t in prefetch_idle],
            "prefetch_busy": [round(t, 4) for t in prefetch_busy],
            "postfetch_idle": [round(t, 4) for t in postfetch_idle],
            "postfetch_busy": [round(t, 4) for t in postfetch_busy],
        },
    }))


if __name__ == "__main__":
    main()
