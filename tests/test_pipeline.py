"""Pipeline layer: decode modes, streaming segments with overlap carry,
interactive session control, KV cache manager lifecycle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.core.interactive import InteractiveSession
from inferix_tpu.core.types import (
    DecodeMode,
    GenerationCommand,
    SegmentBoundary,
    StreamingMode,
)
from inferix_tpu.kvcache.manager import KVCacheManager, KVCacheRequest
from inferix_tpu.models.wan.causal_dit import init_params, make_kv_spec
from inferix_tpu.models.wan.vae import CausalVAE, VAEConfig
from inferix_tpu.pipeline.self_forcing import SelfForcingPipeline


def _tiny_vae():
    return CausalVAE(
        VAEConfig(dim=16, z_dim=16, dim_mult=(1, 2, 2), num_res_blocks=1,
                  temperal_downsample=(True, True)),
        key=jax.random.key(9),
    )


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_test_config()
    cfg.runtime.num_frames = 4
    cfg.runtime.frames_per_segment = 4
    cfg.runtime.overlap_frames = 1
    cfg.runtime.streaming_mode = StreamingMode.TRUE_STREAMING
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    p = SelfForcingPipeline(cfg, params=params, vae=_tiny_vae(),
                            dtype=jnp.float32)
    p.setup()
    return p


def test_no_decode_returns_latents(pipe):
    out = pipe.run_text_to_video(["a cat"], decode_mode=DecodeMode.NO_DECODE)
    r = pipe.config.runtime
    assert out.shape == (1, 4, r.latent_height, r.latent_width,
                         r.latent_channels)


def test_after_all_decode(pipe):
    video = pipe.run_text_to_video(["a cat"],
                                   decode_mode=DecodeMode.AFTER_ALL)
    # 4 latent frames -> 1 + 4*3 = 13 pixel frames, [0, 1] range
    assert video.shape[1] == 13
    v = np.asarray(video)
    assert v.min() >= 0.0 and v.max() <= 1.0


def test_profiler_records_blocks(pipe):
    pipe.run_text_to_video(["x"], decode_mode=DecodeMode.NO_DECODE)
    s = pipe.profiler.summary()
    assert s["num_blocks"] == 4
    assert s["time_to_first_block_s"] is not None
    assert "diffusion_generation" in s["stages_ms"]


def test_streaming_segments_with_overlap(pipe):
    streamed = []
    segments = pipe.run_streaming_generation(
        ["prompt a", "prompt b"], num_segments=3,
        stream_callback=lambda px: streamed.append(np.asarray(px)),
    )
    assert len(segments) == 3
    # segments hold only NEW frames (the carried overlap prefix is trimmed —
    # concatenating segments must not duplicate frames): segment 0 generates
    # 4 frames; segments 1+ carry 1 overlap frame and generate 3 new ones
    assert segments[0].shape[1] == 4
    assert segments[1].shape[1] == 3
    assert segments[2].shape[1] == 3
    # overlap frames appear exactly once across the concatenated stream
    full = np.asarray(jnp.concatenate(segments, axis=1))
    assert full.shape[1] == 10
    # TRUE_STREAMING delivered pixel blocks
    assert len(streamed) > 0
    total_px = sum(s.shape[1] for s in streamed)
    assert total_px > 0


def test_interactive_stop_and_prompt_update(pipe):
    session = InteractiveSession()
    session.submit_input(prompt="new world")
    res = session.evaluate_checkpoint("segment", 0)
    assert res.command == GenerationCommand.UPDATE_PROMPT
    assert res.new_prompt == "new world"
    # queue consumed
    assert session.evaluate_checkpoint("segment", 1).command \
        == GenerationCommand.CONTINUE

    session2 = InteractiveSession()
    session2.stop()
    segs = pipe.run_interactive_generation(session2, "p", num_segments=3)
    assert segs == []


def test_interactive_generation_runs(pipe):
    session = InteractiveSession()
    segs = pipe.run_interactive_generation(session, "p", num_segments=2)
    assert len(segs) == 2
    assert session.status.frames_generated == sum(s.shape[1] for s in segs)


def test_boundary_validation():
    with pytest.raises(ValueError):
        SegmentBoundary(frames_per_segment=7, frames_per_block=3)
    with pytest.raises(ValueError):
        SegmentBoundary(frames_per_segment=6, frames_per_block=3,
                        overlap_frames=6)
    b = SegmentBoundary(frames_per_segment=21, frames_per_block=3,
                        overlap_frames=3)
    assert b.blocks_per_segment == 7
    assert b.unique_frames(10) == 183  # reference accounting (BASELINE.md)


def test_kv_manager_slots():
    cfg = tiny_test_config()
    spec = make_kv_spec(cfg.model, batch=2, latent_h=8, latent_w=8,
                        dtype=jnp.float32)
    mgr = KVCacheManager(spec)
    r1, r2 = KVCacheRequest("a"), KVCacheRequest("b")
    s1 = mgr.allocate_slots(r1)
    s2 = mgr.allocate_slots(r2)
    assert {s1, s2} == {0, 1}
    with pytest.raises(RuntimeError):
        mgr.allocate_slots(KVCacheRequest("c"))
    assert mgr.cache.k.shape[1] == 2
    # free slot and write-then-zero semantics
    cache = mgr.cache
    dirty = jax.tree.map(lambda x: x + 1 if x.dtype != jnp.int8 else x, cache)
    mgr.update(dirty)
    mgr.free(r1)
    assert float(jnp.abs(mgr.cache.k[:, s1]).max()) == 0.0
    assert float(jnp.abs(mgr.cache.k[:, s2]).max()) > 0.0
    s3 = mgr.allocate_slots(KVCacheRequest("c"))
    assert s3 == s1
    mgr.clear()
    assert mgr.device_bytes() == 0


def test_causvid_rollouts(pipe):
    from inferix_tpu.pipeline.causvid import CausVidPipeline

    cfg = tiny_test_config()
    cfg.runtime.num_frames = 4
    cfg.runtime.frames_per_segment = 4
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    cv = CausVidPipeline(cfg, params=params, vae=_tiny_vae(),
                         dtype=jnp.float32)
    segs = cv.run_rollouts("a windmill", num_rollouts=2,
                           num_overlap_frames=2)
    assert len(segs) == 2
    # segment 0: 13 pixel frames minus trimmed overlap (4*1+1=5) = 8
    assert segs[0].shape[1] == 8
    # segment 1 keeps everything; started from 2 overlap latents -> 4 total
    assert segs[1].shape[1] == 13
    for s in segs:
        assert np.isfinite(np.asarray(s)).all()


def test_kv_manager_layer_and_range_api():
    cfg = tiny_test_config()
    spec = make_kv_spec(cfg.model, batch=1, latent_h=8, latent_w=8,
                        dtype=jnp.float32)
    mgr = KVCacheManager(spec)
    req = KVCacheRequest("r")
    mgr.allocate_slots(req)
    kd = jnp.ones((4, spec.num_kv_heads, spec.head_dim))
    mgr.set_range(req, layer_idx=1, start=2, k_data=kd, v_data=kd * 2)
    k, v = mgr.get_range(req, layer_idx=1, start=2, length=4)
    np.testing.assert_array_equal(np.asarray(k), np.asarray(kd))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(kd * 2))
    mgr.free_layer(1)
    k, _ = mgr.get_range(req, layer_idx=1, start=2, length=4)
    assert float(jnp.abs(k).max()) == 0.0


def test_profiler_report_files(tmp_path):
    from inferix_tpu.profiling.profiler import InferixProfiler, ProfilingConfig

    prof = InferixProfiler(ProfilingConfig(output_dir=str(tmp_path)))
    prof.start_session("unit", tag="x")
    with prof.stage("work"):
        pass
    prof.record_block_computation(0, 3, 12.5)
    prof.sample_memory()
    prof.end_session()
    paths = prof.save_report(rank=0)
    assert len(paths) == 2  # json + html
    import json as _json

    with open(paths[0]) as f:
        data = _json.load(f)
    assert data["summary"]["session"] == "unit"
    assert data["blocks"][0]["time_ms"] == 12.5
    assert "<html" in open(paths[1]).read()

    from inferix_tpu.profiling.profiler import aggregate_reports

    agg = aggregate_reports([paths[0], paths[0]])
    assert agg["num_ranks"] == 2


def test_block_level_stop(pipe):
    """A stop issued mid-segment halts at the next BLOCK boundary (the
    segment returns fewer frames), not just the next segment."""
    session = InteractiveSession()
    calls = {"n": 0}

    real_stop = session.is_stopped

    def stream_cb(px):
        calls["n"] += 1
        if calls["n"] == 1:
            session.stop()  # stop after the first streamed block

    segs = pipe.run_interactive_generation(session, "p", num_segments=3,
                                           stream_callback=stream_cb)
    assert len(segs) == 1
    # segment aborted early: fewer than the full 4 frames generated
    assert segs[0].shape[1] < 4


def test_streaming_offload_segments_to_host(pipe):
    segments = pipe.run_streaming_generation(
        ["p"], num_segments=2, offload_segments=True)
    assert len(segments) == 2
    for s in segments:
        assert s.devices() == {jax.devices("cpu")[0]}
        assert np.isfinite(np.asarray(s)).all()


def test_streaming_with_fast_context_mode():
    """run_streaming_generation under context_mode='last_step': segments
    carry overlap correctly and cache context persists across blocks even
    though the clean-context re-run is skipped."""
    import dataclasses

    cfg = tiny_test_config()
    cfg.runtime.num_frames = 4
    cfg.runtime.frames_per_segment = 4
    cfg.runtime.overlap_frames = 1
    cfg.runtime.streaming_mode = StreamingMode.TRUE_STREAMING
    cfg.runtime = dataclasses.replace(cfg.runtime, context_mode="last_step")
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    p = SelfForcingPipeline(cfg, params=params, vae=_tiny_vae(),
                            dtype=jnp.float32)
    p.setup()
    segments = p.run_streaming_generation(
        ["prompt"], num_segments=2, offload_segments=True)
    assert segments[0].shape[1] == 4 and segments[1].shape[1] == 3
    assert all(np.isfinite(np.asarray(s)).all() for s in segments)


def test_profiler_html_report_full_sections(tmp_path):
    """HTML report carries the reference reporter's analyses (stage share
    bars, block-latency chart with hover tooltips, diffusion steps,
    streaming, events, recommendations) — not just a summary table
    (reference `profiling/reporter.py:11-1268`)."""
    import re
    import time
    import xml.dom.minidom

    from inferix_tpu.profiling.profiler import InferixProfiler, ProfilingConfig

    prof = InferixProfiler(ProfilingConfig(output_dir=str(tmp_path),
                                           report_format="html"))
    prof.start_session("full", model="tiny")
    with prof.stage("diffusion"):
        time.sleep(0.001)
    for b in range(4):
        for s in range(3):
            prof.record_diffusion_step(s, 1.0 - 0.3 * s, 3, 10.0 + s)
        prof.record_block_computation(b, 3, 50.0 + 40.0 * b)  # >2.5x spread
    prof.record_streaming(3, 25.0)
    prof.add_event("swap", bytes=1024)
    prof.end_session()
    (path,) = prof.save_report()
    html = open(path).read()
    for section in ("Stage timing", "Block latency", "Diffusion steps",
                    "Streaming", "Events", "Recommendations", "tiles"):
        assert section in html, section
    # charts: well-formed inline SVG with native <title> hover targets
    svgs = re.findall(r"<svg.*?</svg>", html, re.S)
    assert svgs
    for s in svgs:
        xml.dom.minidom.parseString(s)
    assert "<title>" in html
    # stage bars carry direct value labels
    assert re.search(r'class="bv">[\d,.]+ ms', html)


def test_causvid_rollouts_overlap_one():
    """Regression: num_overlap_frames=1 used to take a -0 slice (the WHOLE
    previous segment) as the carry, making the next segment's frame count
    negative. Overlap 1 = the re-encoded boundary frame alone."""
    from inferix_tpu.pipeline.causvid import CausVidPipeline

    cfg = tiny_test_config()
    cfg.runtime.num_frames = 4
    cfg.runtime.frames_per_segment = 4
    params = init_params(jax.random.key(0), cfg.model, dtype=jnp.float32)
    cv = CausVidPipeline(cfg, params=params, vae=_tiny_vae(),
                         dtype=jnp.float32)
    segs = cv.run_rollouts("a windmill", num_rollouts=2,
                           num_overlap_frames=1)
    assert len(segs) == 2
    for s in segs:
        assert np.isfinite(np.asarray(s)).all()
