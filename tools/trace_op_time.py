#!/usr/bin/env python
"""Summarize a jax.profiler trace by HLO-op category, source line, and name.

Usage:
    python tools/trace_op_time.py <trace_dir> [top_n] [--iters N]

Two readers, tried in order:

1. xprof's hlo_stats converter over the .xplane.pb (when the xprof wheel
   can parse the relay's xplane — it cannot for every tool version);
2. the vm.trace.json.gz chrome trace jax.profiler always writes next to
   it. The JSON events carry everything the table needs per op:
   `hlo_category`, `model_flops`, `bytes_accessed`, and `source`
   (file:line of the jaxpr equation the HLO came from), so this path also
   prints achieved TF/s / GB/s per line of OUR code — the table behind the
   round-4 1024px attribution in docs/ROUND4_NOTES.md.

Container events ("while"/"conditional" bodies and the unnamed run_module
roots) nest the real ops and would double-count; they are excluded. With
--iters N every figure is also normalized per training iteration.

No TPU needed — pure post-processing of a saved trace directory.
"""

import argparse
import collections
import csv
import glob
import gzip
import io
import json
import os

# categories whose events CONTAIN other events (double counting)
_CONTAINERS = {"?", "", "while", "conditional"}


def load_hlo_stats(trace_dir: str):
    """Return hlo_stats rows (list of dicts) for the first device xplane."""
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        raise SystemExit("hlo_stats produced no rows")
    return rows


def load_json_events(trace_dir: str):
    """Device complete-events from ALL chrome traces under `trace_dir`, with
    container events (while/conditional bodies, uncategorized run_module
    roots) dropped so durations sum to busy time. The per-category excluded
    duration is reported instead of silently discarded (advisor r4)."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    if len(paths) > 1:
        print(f"# merging {len(paths)} trace files under {trace_dir}")
    out = []
    excluded = collections.Counter()
    for path in paths:
        with gzip.open(path, "rt") as f:
            tr = json.load(f)
        events = tr["traceEvents"]
        device_pids = {
            e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")}
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in device_pids:
                continue
            cat = e.get("args", {}).get("hlo_category", "?")
            if cat in _CONTAINERS:
                excluded[cat or "(empty)"] += e.get("dur", 0)
                continue
            out.append(e)
    if excluded:
        det = ", ".join(f"{c}: {d / 1e3:.1f} ms"
                        for c, d in excluded.most_common())
        print(f"# excluded container/uncategorized events (these NEST the "
              f"ops counted below): {det}")
    if not out:
        raise SystemExit("no device op events in the JSON trace")
    return out


def _f(row, *keys, default=0.0):
    for k in keys:
        if k in row and row[k] not in ("", None):
            try:
                return float(row[k])
            except ValueError:
                pass
    return default


def _shorten(src: str) -> str:
    return src.replace(
        "/root/repo/content_aware_gan_compression_tpu/", "")


def report_json(trace_dir, top_n, iters):
    ev = load_json_events(trace_dir)
    per = "/it" if iters else ""
    div = iters or 1

    cats = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    srcs = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    ops = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    total = 0.0
    for e in ev:
        a = e.get("args", {})
        fl = float(a.get("model_flops", 0) or 0)
        by = float(a.get("bytes_accessed", 0) or 0)
        for table, key in ((cats, a.get("hlo_category", "?")),
                           (srcs, _shorten(a.get("source", "<none>"))),
                           (ops, e["name"])):
            r = table[key]
            r[0] += e["dur"]
            r[1] += fl
            r[2] += by
            r[3] += 1
        total += e["dur"]

    def row(t, f, b):
        tf = f / t / 1e6 if t else 0.0
        gb = b / t * 1e6 / 1e9 if t else 0.0
        return (f"{t / div / 1e3:9.2f} ms{per} {100 * t / total:5.1f}%  "
                f"{tf:6.1f} TF/s {gb:6.0f} GB/s")

    print(f"device busy: {total / 1e3:.1f} ms over the trace window"
          + (f" = {total / div / 1e3:.1f} ms/iter" if iters else ""))
    print("\n== by HLO category ==")
    for c, (t, f, b, n) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        print(f"{row(t, f, b)}  {c}")
    print(f"\n== top {top_n} source lines ==")
    for s, (t, f, b, n) in sorted(
            srcs.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{row(t, f, b)}  {s}")
    print(f"\n== top {top_n} ops ==")
    for nm, (t, f, b, n) in sorted(
            ops.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{row(t, f, b)}  n={n:<6d} {nm}")


def report_hlo_stats(trace_dir, top_n):
    rows = load_hlo_stats(trace_dir)
    time_keys = ("total_time_us", "Total time (us)", "occurrences_time_us")
    cat_keys = ("hlo_category", "HLO op category", "category")
    name_keys = ("hlo_op_name", "HLO op name", "name")

    by_cat = {}
    by_op = {}
    total = 0.0
    for r in rows:
        t = _f(r, *time_keys)
        cat = next((r[k] for k in cat_keys if r.get(k)), "?")
        name = next((r[k] for k in name_keys if r.get(k)), "?")
        by_cat[cat] = by_cat.get(cat, 0.0) + t
        by_op[(cat, name)] = by_op.get((cat, name), 0.0) + t
        total += t

    print(f"total device op time: {total / 1e3:.2f} ms "
          f"(over the whole trace window)\n")
    print("== by category ==")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t / 1e3:10.2f} ms  {100 * t / total:5.1f}%  {cat}")
    print(f"\n== top {top_n} ops ==")
    for (cat, name), t in sorted(by_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{t / 1e3:10.2f} ms  [{cat}] {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("top_n", nargs="?", type=int, default=20)
    ap.add_argument("--iters", type=int, default=None,
                    help="training iterations inside the trace window; "
                         "normalizes every figure per iteration")
    args = ap.parse_args()
    try:
        report_hlo_stats(args.trace_dir, args.top_n)
    except (Exception, SystemExit) as exc:  # converter broken for this trace
        print(f"# hlo_stats converter unavailable ({type(exc).__name__}: "
              f"{exc}); falling back to the chrome JSON trace\n")
        report_json(args.trace_dir, args.top_n, args.iters)


if __name__ == "__main__":
    main()
