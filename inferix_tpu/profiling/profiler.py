"""Profiling subsystem: sessions, stages, events, block/diffusion recorders,
JSON + HTML reports, time-to-first-block.

Capability parity with the reference profiler
(`inferix/profiling/profiler.py:25-611` sessions/stages/events,
`reporter.py:11-1268` HTML/JSON + recommendations + first-block-delay metric,
`diffusion_analyzer.py`, `aggregate_reports.py` multi-host merge), adapted to
TPU: device timing comes from `block_until_ready` wall-clock around jitted
steps (XLA has no CUDA-event equivalent; jax.profiler traces cover kernel
level) and an optional `jax.profiler` trace can be attached to a session.
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional

import jax


@dataclasses.dataclass
class ProfilingConfig:
    enabled: bool = True
    output_dir: str = "profiling_reports"
    report_format: str = "both"  # "json" | "html" | "both"
    capture_jax_trace: bool = False
    jax_trace_dir: Optional[str] = None
    max_data_points: int = 10000

    def __post_init__(self):
        if self.report_format not in ("json", "html", "both"):
            raise ValueError(f"bad report_format {self.report_format!r}")


@dataclasses.dataclass
class StageRecord:
    name: str
    start: float
    end: float = 0.0

    @property
    def duration_ms(self) -> float:
        return (self.end - self.start) * 1e3


class InferixProfiler:
    """Session-scoped profiler threaded through pipelines by injection
    (reference pattern: `base_pipeline.py:43-53`)."""

    def __init__(self, config: Optional[ProfilingConfig] = None):
        self.config = config or ProfilingConfig()
        self.reset()

    def reset(self) -> None:
        self.session_name: Optional[str] = None
        self.session_tags: Dict[str, Any] = {}
        self.session_start: float = 0.0
        self.session_end: float = 0.0
        self.stages: List[StageRecord] = []
        self.events: List[Dict[str, Any]] = []
        self.diffusion_steps: List[Dict[str, Any]] = []
        self.blocks: List[Dict[str, Any]] = []
        self.streaming: List[Dict[str, Any]] = []
        self.memory_samples: List[Dict[str, Any]] = []
        self._first_block_time: Optional[float] = None
        self._trace_ctx = None

    # -- session ------------------------------------------------------------

    def start_session(self, name: str, **tags: Any) -> None:
        if not self.config.enabled:
            return
        self.reset()
        self.session_name = name
        self.session_tags = tags
        self.session_start = time.perf_counter()
        if self.config.capture_jax_trace:
            trace_dir = self.config.jax_trace_dir or os.path.join(
                self.config.output_dir, "jax_trace"
            )
            os.makedirs(trace_dir, exist_ok=True)
            self._trace_ctx = jax.profiler.trace(trace_dir)
            self._trace_ctx.__enter__()

    def end_session(self) -> Optional[Dict[str, Any]]:
        if not self.config.enabled or self.session_name is None:
            return None
        self.session_end = time.perf_counter()
        if self._trace_ctx is not None:
            self._trace_ctx.__exit__(None, None, None)
            self._trace_ctx = None
        return self.summary()

    # -- recording ----------------------------------------------------------

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.config.enabled:
            yield
            return
        rec = StageRecord(name=name, start=time.perf_counter())
        try:
            yield
        finally:
            rec.end = time.perf_counter()
            self.stages.append(rec)

    def add_event(self, name: str, **data: Any) -> None:
        if self.config.enabled and len(self.events) < self.config.max_data_points:
            self.events.append(
                {"name": name, "t": time.perf_counter(), **data}
            )

    def record_diffusion_step(self, step: int, timestep: float,
                              block_size: int, computation_time_ms: float,
                              guidance_scale: Optional[float] = None) -> None:
        if self.config.enabled:
            self.diffusion_steps.append({
                "step": step, "timestep": timestep, "block_size": block_size,
                "time_ms": computation_time_ms, "guidance": guidance_scale,
            })

    def record_block_computation(self, block_index: int, block_size: int,
                                 computation_time_ms: float,
                                 memory_usage_mb: float = 0.0) -> None:
        if not self.config.enabled:
            return
        self.blocks.append({
            "block": block_index, "frames": block_size,
            "time_ms": computation_time_ms, "memory_mb": memory_usage_mb,
        })
        if self._first_block_time is None:
            self._first_block_time = time.perf_counter() - self.session_start

    def record_streaming(self, frames: int, latency_ms: float) -> None:
        if self.config.enabled:
            self.streaming.append({"frames": frames, "latency_ms": latency_ms})

    def sample_memory(self) -> None:
        if not self.config.enabled:
            return
        try:
            stats = jax.devices()[0].memory_stats() or {}
            self.memory_samples.append({
                "t": time.perf_counter() - self.session_start,
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            })
        except Exception:
            pass

    # -- reporting ----------------------------------------------------------

    @property
    def time_to_first_block_s(self) -> Optional[float]:
        return self._first_block_time

    def summary(self) -> Dict[str, Any]:
        total_s = (self.session_end or time.perf_counter()) - self.session_start
        block_times = [b["time_ms"] for b in self.blocks]
        frames = sum(b["frames"] for b in self.blocks)
        stage_totals: Dict[str, float] = {}
        for s in self.stages:
            stage_totals[s.name] = stage_totals.get(s.name, 0.0) + s.duration_ms
        summary = {
            "session": self.session_name,
            "tags": self.session_tags,
            "total_s": total_s,
            "stages_ms": stage_totals,
            "num_blocks": len(self.blocks),
            "frames": frames,
            "avg_block_ms": (sum(block_times) / len(block_times))
            if block_times else None,
            "p50_block_ms": sorted(block_times)[len(block_times) // 2]
            if block_times else None,
            "frames_per_s": frames / total_s if total_s > 0 and frames else None,
            "time_to_first_block_s": self._first_block_time,
            "avg_step_ms": (
                sum(d["time_ms"] for d in self.diffusion_steps)
                / len(self.diffusion_steps)
            ) if self.diffusion_steps else None,
            "peak_memory_bytes": max(
                (m["peak_bytes_in_use"] for m in self.memory_samples),
                default=None,
            ),
            "recommendations": self._recommend(),
        }
        return summary

    def _recommend(self) -> List[str]:
        recs = []
        if self.blocks:
            times = [b["time_ms"] for b in self.blocks]
            if max(times) > 2.5 * min(times):
                recs.append(
                    "block latency varies >2.5x — early blocks are cheaper "
                    "(partial KV cache); consider reporting steady-state only"
                )
        if self._first_block_time and self._first_block_time > 5.0:
            recs.append(
                "time-to-first-block > 5s — check compilation caching / "
                "prefill cost"
            )
        return recs

    def save_report(self, rank: int = 0) -> List[str]:
        if not self.config.enabled or self.session_name is None:
            return []
        os.makedirs(self.config.output_dir, exist_ok=True)
        base = os.path.join(
            self.config.output_dir, f"{self.session_name}_rank{rank}"
        )
        paths = []
        data = {
            "summary": self.summary(),
            "stages": [dataclasses.asdict(s) for s in self.stages],
            "blocks": self.blocks,
            "diffusion_steps": self.diffusion_steps,
            "streaming": self.streaming,
            "memory": self.memory_samples,
            "events": self.events,
        }
        if self.config.report_format in ("json", "both"):
            p = base + ".json"
            with open(p, "w") as f:
                json.dump(data, f, indent=2)
            paths.append(p)
        if self.config.report_format in ("html", "both"):
            p = base + ".html"
            with open(p, "w") as f:
                f.write(_render_html(data))
            paths.append(p)
        return paths


def aggregate_reports(paths: List[str]) -> Dict[str, Any]:
    """Merge per-host JSON reports (reference `aggregate_reports.py`)."""
    reports = []
    for p in paths:
        with open(p) as f:
            reports.append(json.load(f))
    if not reports:
        return {}
    keys = ("total_s", "avg_block_ms", "frames_per_s", "time_to_first_block_s")
    agg: Dict[str, Any] = {"num_ranks": len(reports)}
    for k in keys:
        vals = [r["summary"].get(k) for r in reports
                if r["summary"].get(k) is not None]
        if vals:
            agg[k] = {"min": min(vals), "max": max(vals),
                      "avg": sum(vals) / len(vals)}
    return agg


def _render_html(data: Dict[str, Any]) -> str:
    s = data["summary"]
    rows = "".join(
        f"<tr><td>{k}</td><td>{json.dumps(v)}</td></tr>"
        for k, v in s.items()
    )
    block_rows = "".join(
        f"<tr><td>{b['block']}</td><td>{b['frames']}</td>"
        f"<td>{b['time_ms']:.1f}</td></tr>"
        for b in data["blocks"]
    )
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>inferix_tpu profile: {s.get('session')}</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #ccc;padding:4px 10px}}</style></head><body>
<h1>Profile: {s.get('session')}</h1>
<h2>Summary</h2><table>{rows}</table>
<h2>Blocks</h2><table><tr><th>block</th><th>frames</th><th>ms</th></tr>
{block_rows}</table>
</body></html>"""
