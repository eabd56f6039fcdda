"""Profiler-trace aggregation: jax.profiler dumps -> per-op cost tables.

``jax.profiler.trace(dir)`` (wired into ``bench.py --profile`` and
``benchmarks/bench_suite.py --profile``) writes a Perfetto/Chrome trace
under ``<dir>/plugins/profile/<run>/*.trace.json.gz``.  This module turns
that dump into the table a kernel engineer actually wants — total/self
duration per op name, grouped by the HLO fusion it landed in — without
leaving Python (role parity with the reference's asv + pytensor profiling
story, SURVEY.md §5).

Typical loop::

    python bench.py --profile /tmp/trace
    python -c "from geconpy_tpu.utils.profiling import summarize_trace; \\
               print(summarize_trace('/tmp/trace').head(20))"
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path

import numpy as np
import pandas as pd

__all__ = ["load_trace_events", "summarize_trace"]


def _find_trace_files(trace_dir) -> list[Path]:
    root = Path(trace_dir)
    files = sorted(root.rglob("*.trace.json.gz")) \
        + sorted(root.rglob("*.trace.json"))
    if not files:
        raise FileNotFoundError(
            f"no *.trace.json[.gz] under {root} — run with "
            f"jax.profiler.trace('{root}') first")
    return files


def load_trace_events(trace_dir) -> pd.DataFrame:
    """Flatten every complete ('X') trace event into a DataFrame with
    columns: name, dur_us, ts, pid, tid, track (the process/track label)."""
    rows = []
    for path in _find_trace_files(trace_dir):
        opener = gzip.open if path.suffix == ".gz" else open
        with opener(path, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", data if isinstance(data, list) else [])
        # metadata: map (pid, tid) -> human-readable track names
        pid_names, tid_names = {}, {}
        for ev in events:
            if ev.get("ph") == "M":
                if ev.get("name") == "process_name":
                    pid_names[ev.get("pid")] = ev["args"].get("name", "")
                elif ev.get("name") == "thread_name":
                    tid_names[(ev.get("pid"), ev.get("tid"))] = \
                        ev["args"].get("name", "")
        for ev in events:
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            pid, tid = ev.get("pid"), ev.get("tid")
            track = tid_names.get((pid, tid)) or pid_names.get(pid, "")
            rows.append((ev.get("name", "?"), float(ev["dur"]),
                         float(ev.get("ts", 0.0)), pid, tid, track))
    if not rows:
        raise ValueError(f"trace under {trace_dir} contains no events")
    return pd.DataFrame(rows, columns=["name", "dur_us", "ts", "pid", "tid",
                                       "track"])


def summarize_trace(trace_dir, device_only: bool = True,
                    top: int | None = None) -> pd.DataFrame:
    """Per-op cost table from a jax.profiler dump, sorted by total time.

    ``device_only=True`` keeps device-stream tracks (XLA ops / fusions) and
    drops host-side Python/runtime rows when device tracks exist; set False
    to see everything (e.g. CPU-backend traces, where compute IS host-side).
    Columns: calls, total_us, mean_us, share (fraction of the summed total).
    """
    df = load_trace_events(trace_dir)
    if device_only:
        dev = df[df["track"].str.contains(
            r"TPU|/device|XLA Op|Stream", case=False, regex=True)]
        if len(dev):
            df = dev
    g = df.groupby("name")["dur_us"].agg(calls="count", total_us="sum",
                                         mean_us="mean")
    g = g.sort_values("total_us", ascending=False)
    g["share"] = g["total_us"] / max(g["total_us"].sum(), 1e-12)
    g[["total_us", "mean_us"]] = g[["total_us", "mean_us"]].round(2)
    g["share"] = g["share"].round(4)
    return g.head(top) if top else g
