"""Observability: render stats, structured run logs, profiler hooks.

The reference's only instrumentation is a chrono frame timer whose consumer
is commented out, and a debug.log ofstream that is opened and never written
(CSVersion/DxCSApp.cpp:460-471,415,455; SURVEY.md §5).  Here:

- :class:`RenderStats` — wall-time + rays/sec accounting around any render
  call (``block_until_ready`` walls so device async doesn't lie);
- :func:`log_run` — append one JSON line per run to a structured run log;
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time

import jax

from raytpu.config import RenderConfig


@dataclasses.dataclass
class RenderStats:
    """Throughput accounting for one render (or train) invocation."""

    wall_s: float
    primary_rays: int
    rays_per_sec: float
    config: str
    label: str = "fwd"

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def timed(fn, cfg: RenderConfig, label: str = "fwd",
          iters: int = 1) -> tuple[object, RenderStats]:
    """Run ``fn()`` ``iters`` times (after one warmup) and wall it.

    Returns (last_result, stats).  ``primary_rays`` counts
    width*height*spp per invocation — the BASELINE.json workload unit.
    """
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / iters
    rays = cfg.width * cfg.height * cfg.spp
    return out, RenderStats(
        wall_s=wall, primary_rays=rays, rays_per_sec=rays / wall,
        config=f"{cfg.width}x{cfg.height} spp{cfg.spp} d{cfg.depth}",
        label=label)


def log_run(path: str, stats: RenderStats, **extra) -> None:
    """Append one structured JSON line to the run log."""
    rec = {"ts": time.time(), **stats.as_dict(), **extra}
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block (view in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_events(run_once, pid_match: str = "TPU") -> list:
    """All device-side complete events of one traced dispatch.

    Runs ``run_once()`` (ONE blocking dispatch) under ``jax.profiler``
    and returns ``[(name, dur_ms), ...]`` for every ``ph == "X"`` event
    on trace pids whose process name contains ``pid_match``, sorted by
    duration descending.  The list contains BOTH the top-level
    ``jit_<fn>(...)`` program event spanning the whole dispatch and the
    per-kernel events under it (e.g. the forward megakernel and the
    fused-VJP kernel show up as separate entries in a grad dispatch) —
    verified over the tunnel in scripts/probe_devms_r5.py, where the
    top event equals the busy-union of the kernel events.
    """
    import glob
    import gzip
    import tempfile

    d = tempfile.mkdtemp()
    with trace(d):
        run_once()
    out = []
    for path in glob.glob(d + "/plugins/profile/*/*.trace.json.gz"):
        with gzip.open(path) as fh:
            tr = json.load(fh)
        ev = tr.get("traceEvents", [])
        pids = {e["pid"] for e in ev
                if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and pid_match in str(e.get("args", {}).get("name", ""))}
        for e in ev:
            if e.get("ph") == "X" and e.get("pid") in pids:
                out.append((str(e.get("name", "")), e.get("dur", 0) / 1e3))
    out.sort(key=lambda t: -t[1])
    return out


def device_ms(run_once, pid_match: str = "TPU") -> float:
    """Device-side wall of one dispatch, from a ``jax.profiler`` trace.

    ``run_once()`` must execute ONE blocking dispatch; the result is the
    longest single event on a trace pid whose process name contains
    ``pid_match`` — the top-level XLA program event, which spans every
    kernel in the dispatch (fwd-only or fwd+bwd alike).  This is the
    honest per-frame chip time: wall clocks over a remote-device link
    include a per-dispatch transport floor (measured ~28-35 ms on the
    axon tunnel — round-4 forensics: a config-4 frame walled 136.3 ms
    but ran 100.6 ms on device).  Device tracing works over the tunnel;
    pass ``pid_match="CPU"`` to time host-platform runs (XLA CPU events
    land on the host pid).
    """
    evs = device_events(run_once, pid_match)
    if not evs or evs[0][1] <= 0:
        raise RuntimeError(
            f"no events on a pid matching {pid_match!r} in the trace")
    return evs[0][1]
