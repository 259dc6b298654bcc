#!/usr/bin/env python
"""Turn the HBM "it ran" lower bound into a measured MARGIN (VERDICT r3
weak #5): binary-search the largest `--fid_batch` and the largest
`--steps_per_dispatch` for which the 1024px worst case (training dispatches
interleaved with an overlapped FID eval, tools/hbm_headroom.py) still fits
the 16 GB v5e.

Each probe runs hbm_headroom.py in a SUBPROCESS: an OOM through the axon
relay can kill the TPU worker (it auto-restarts for the next process), so
probes must be isolated. Exit 0 = fits; nonzero (or an OOM signature in the
output) = does not fit. The persistent compilation cache keeps repeat
probes cheap — only the shape that changed recompiles.

Writes docs/HBM_ENVELOPE.json:
  {"fid_batch": {"max_fit": N, "min_oom": M, "probes": {...}}, ...}
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADROOM = os.path.join(REPO, "tools", "hbm_headroom.py")

OOM_SIGNATURES = ("RESOURCE_EXHAUSTED", "Out of memory", "OOM",
                  "Allocation failure", "exceeds the limit",
                  # XLA:TPU compile-time OOM phrasing (seen at
                  # steps_per_dispatch>=52, 1024px: "Ran out of memory in
                  # memory space hbm ... Exceeded hbm capacity by N")
                  "Ran out of memory", "Exceeded hbm capacity")


def probe(size, batch_size, fid_batch, steps_per_dispatch, timeout,
          remat=False):
    cmd = [sys.executable, HEADROOM, "--size", str(size),
           "--batch_size", str(batch_size), "--fid_batch", str(fid_batch),
           "--steps_per_dispatch", str(steps_per_dispatch),
           "--remat" if remat else "--no-remat"]
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"fits": False, "reason": "timeout", "s": round(timeout, 1)}
    out = r.stdout + r.stderr
    fits = r.returncode == 0
    reason = "ok" if fits else "exit %d" % r.returncode
    if not fits:
        for sig in OOM_SIGNATURES:
            if sig in out:
                reason = "oom"
                break
    rec = {"fits": fits, "reason": reason, "s": round(time.time() - t0, 1)}
    if fits:
        # the stats JSON is stdout's last line; `out` mixes in stderr
        # (warnings land after it), so parse stdout alone
        try:
            rec["stats"] = json.loads(r.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError, AttributeError):
            pass
    return rec


def search(name, lo, hi_cap, run):
    """Largest power-of-two-ish value in [lo, hi_cap] that fits: double from
    lo until the first failure (or cap), then binary-search the boundary."""
    probes = {}

    def fits(v):
        if v not in probes:
            print(f"# probe {name}={v} ...", flush=True)
            probes[v] = run(v)
            print(f"#   -> {probes[v]}", flush=True)
        return probes[v]["fits"]

    if not fits(lo):
        return {"max_fit": None, "min_oom": lo,
                "probes": {str(k): v for k, v in sorted(probes.items())}}
    good, v = lo, lo * 2
    while v <= hi_cap and fits(v):
        good, v = v, v * 2
    if v > hi_cap:
        return {"max_fit": good, "min_oom": None, "cap": hi_cap,
                "probes": {str(k): v for k, v in sorted(probes.items())}}
    bad = v
    while bad - good > max(1, good // 8):  # ~12% resolution is enough
        mid = (good + bad) // 2
        if fits(mid):
            good = mid
        else:
            bad = mid
    return {"max_fit": good, "min_oom": bad,
            "probes": {str(k): v for k, v in sorted(probes.items())}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--base_fid_batch", type=int, default=16)
    ap.add_argument("--base_steps", type=int, default=8)
    ap.add_argument("--fid_batch_cap", type=int, default=512)
    ap.add_argument("--steps_cap", type=int, default=128)
    ap.add_argument("--probe_timeout", type=int, default=1800)
    ap.add_argument("--remat", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="probe the remat step (default: the production "
                         "no-remat configuration)")
    ap.add_argument("--out_json",
                    default=os.path.join(REPO, "docs", "HBM_ENVELOPE.json"))
    args = ap.parse_args()

    result = {"metric": "hbm_envelope", "size": args.size,
              "batch_size": args.batch_size, "remat": args.remat,
              "base": {"fid_batch": args.base_fid_batch,
                       "steps_per_dispatch": args.base_steps}}

    result["fid_batch"] = search(
        "fid_batch", args.base_fid_batch, args.fid_batch_cap,
        lambda v: probe(args.size, args.batch_size, v, args.base_steps,
                        args.probe_timeout, args.remat))
    result["steps_per_dispatch"] = search(
        "steps_per_dispatch", args.base_steps, args.steps_cap,
        lambda v: probe(args.size, args.batch_size, args.base_fid_batch, v,
                        args.probe_timeout, args.remat))

    with open(args.out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
