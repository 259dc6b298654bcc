#!/usr/bin/env python
"""Summarize a jax.profiler trace by HLO-op category and name.

Usage:
    python tools/trace_op_time.py <trace_dir> [top_n]

Reads the .xplane.pb written by `jax.profiler.trace` (e.g. from
`bench.py --trace_dir`) through xprof's hlo_stats converter and prints total
device time per op category (convolution fusions, layout copies, elementwise
fusions, ...) plus the top individual ops. This is the tool behind the
round-2/3 layout-copy accounting in docs/ARCHITECTURE.md section 6b.

No TPU needed — pure post-processing of a saved trace directory.
"""

import csv
import glob
import io
import os
import sys


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


def _f(row, *keys, default=0.0):
    for k in keys:
        if k in row and row[k] not in ("", None):
            try:
                return float(row[k])
            except ValueError:
                pass
    return default


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
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


if __name__ == "__main__":
    main()
