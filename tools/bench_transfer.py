#!/usr/bin/env python
"""Host->device transfer microbenchmark (the e2e-vs-bench gap).

The production loop ships one uint8 image batch per iteration
(256px B16 = 3.15 MB). bench.py keeps a device-resident batch, so any
difference between bench and e2e rates is loader + transfer + scheduling.
This tool measures, on the live backend:

  1. raw device_put bandwidth (fresh buffers, both batch and K-window sizes)
  2. whether a device_put issued while a long jit executes OVERLAPS the
     compute or SERIALIZES behind it (stream semantics of the transport)
  3. whether moving the put to a host thread changes (2)

Prints one JSON line. On a tunneled relay expect low raw bandwidth; on a
real TPU host (PCIe) the put is ~free and e2e == bench.
"""

import argparse
import concurrent.futures
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_put(x):
    t0 = time.perf_counter()
    import jax

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

    rng = np.random.default_rng(0)
    shape = (args.batch_size, args.size, args.size, 3)
    mb = np.prod(shape) / 2**20

    # 1) raw put bandwidth (fresh host buffers each rep: no caching)
    put_s = []
    for _ in range(args.reps):
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        dt, y = timed_put(x)
        put_s.append(dt)
        del y
    bw = mb / np.median(put_s)

    wshape = (args.window,) + shape
    wmb = np.prod(wshape) / 2**20
    x = rng.integers(0, 256, wshape, dtype=np.uint8)
    wdt, _ = timed_put(x)
    wbw = wmb / wdt

    # long compute: a chain of matmuls sized to ~2-3 s on one chip
    n = 8192
    a = jax.device_put(rng.standard_normal((n, n)).astype(np.float32))

    @jax.jit
    def heavy(a):
        x = a.astype(jnp.bfloat16)
        for _ in range(24):
            x = x @ x * (1.0 / n)
        return jnp.float32(x[0, 0])

    float(heavy(a))  # compile
    t0 = time.perf_counter()
    float(heavy(a))
    compute_s = time.perf_counter() - t0

    # 2) dispatch compute, then put from the SAME thread, then join both
    x = rng.integers(0, 256, wshape, dtype=np.uint8)
    t0 = time.perf_counter()
    r = heavy(a)
    dt_put, y = timed_put(x)
    float(r)
    same_thread_s = time.perf_counter() - t0
    del y

    # 3) dispatch compute, put from a WORKER thread
    x = rng.integers(0, 256, wshape, dtype=np.uint8)
    with concurrent.futures.ThreadPoolExecutor(1) as ex:
        t0 = time.perf_counter()
        r = heavy(a)
        fut = ex.submit(timed_put, x)
        float(r)
        dt_thread, y = fut.result()
        threaded_s = time.perf_counter() - t0
    del y

    serial_s = compute_s + wdt
    print(json.dumps({
        "metric": "host_to_device_transfer",
        "batch_mb": round(float(mb), 2),
        "put_bw_mb_s": round(float(bw), 1),
        "window_mb": round(float(wmb), 2),
        "window_put_bw_mb_s": round(float(wbw), 1),
        "compute_s": round(compute_s, 3),
        "put_s": round(float(np.median(put_s)), 4),
        "window_put_s": round(wdt, 3),
        "same_thread_total_s": round(same_thread_s, 3),
        "threaded_total_s": round(threaded_s, 3),
        "serial_expectation_s": round(serial_s, 3),
        "overlap_expectation_s": round(max(compute_s, wdt), 3),
    }))


if __name__ == "__main__":
    main()
