"""Summarize a CFI_PROFILE capture: top ops by total device time.

Usage:
  python tools/trace_ops.py /tmp/prof/bench_rife [top_n]

Reads the Chrome-format trace (``trace.json.gz``) that ``jax.profiler.trace``
writes under ``<dir>/plugins/profile/<run>/``, filters to device (TPU) tracks,
and aggregates event durations by (cleaned) op name — the measurement that
settles where a bench config's milliseconds actually go (VERDICT r3: the RIFE
roofline question needs committed attribution, not guesses).
"""

import gzip
import json
import os
import re
import sys
from collections import defaultdict


def find_traces(root):
    hits = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith("trace.json.gz") or fn == "trace.json":
                hits.append(os.path.join(dirpath, fn))
    return sorted(hits)


def clean(name):
    # strip fusion numbering so variants aggregate: "fusion.123" -> "fusion",
    # "%convolution.42" -> "convolution"
    name = name.split("/")[-1]
    name = re.sub(r"[%]", "", name)
    name = re.sub(r"\.\d+$", "", name)
    return name


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = find_traces(root)
    if not paths:
        print(f"no trace.json(.gz) under {root}")
        return 1
    path = paths[-1]
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        doc = json.load(f)
    events = doc.get("traceEvents", [])

    # identify device pids: process_name metadata containing "TPU" / "device"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "Device" in name
    }

    totals = defaultdict(float)
    counts = defaultdict(int)
    wall = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        name = clean(e.get("name", "?"))
        totals[name] += dur
        counts[name] += 1
        wall += dur
    print(f"trace: {path}")
    print(f"device tracks: {[pid_names.get(p, p) for p in device_pids] or 'ALL (no device metadata)'}")
    print(f"total device op time: {wall:.1f} ms\n")
    print(f"{'op':<52}{'ms':>10}{'%':>7}{'calls':>8}")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{name:<52}{ms:>10.1f}{100 * ms / max(wall, 1e-9):>6.1f}%{counts[name]:>8}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
