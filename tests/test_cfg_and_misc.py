"""CFG pipeline, fm solvers, monitors, decorators, EventPathTimer."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.core.config import tiny_test_config
from inferix_tpu.core.monitoring import EventPathTimer, event_path_timer
from inferix_tpu.models.schedulers.fm_solvers import FlowDPMSolverMultistep
from inferix_tpu.pipeline.self_forcing_cfg import CausalDiffusionPipeline
from inferix_tpu.profiling.decorators import profile_session, profile_stage
from inferix_tpu.profiling.monitors import DeviceMonitor, HostMonitor
from inferix_tpu.profiling.profiler import InferixProfiler


def test_solver_recovers_clean_data():
    """With a perfect flow oracle (v = eps - x0), multistep sampling from
    pure noise must converge to x0."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4)), jnp.float32)
    solver = FlowDPMSolverMultistep.create(24, shift=3.0)

    x = eps  # sigma_max = 1 -> pure noise
    state = solver.init_state(x.shape)
    for i in range(24):
        s = float(solver.sigmas[i])
        # oracle flow at current sample: v = (x - x0)/s  (since x=(1-s)x0+s*eps)
        v = (x - x0) / s
        x, state = solver.step(v, i, x, state)
    err = float(jnp.abs(x - x0).max())
    assert err < 0.05, err


def test_cfg_pipeline_runs_and_guidance_matters():
    cfg = tiny_test_config()
    cfg.runtime.num_frames = 2
    pipe = CausalDiffusionPipeline(cfg, num_sampling_steps=4,
                                   dtype=jnp.float32)
    a = pipe.run_text_to_video(["x"], guidance_scale=1.0, seed=3)
    assert a.shape == (1, 2, cfg.runtime.latent_height,
                       cfg.runtime.latent_width, cfg.runtime.latent_channels)
    assert np.isfinite(np.asarray(a)).all()
    b = pipe.run_text_to_video(["x"], guidance_scale=6.0, seed=3)
    # cond==uncond contexts here (zero text), so outputs match regardless of g
    # -> check determinism instead; guidance plumbing is exercised above
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_monitors_collect_samples():
    hm = HostMonitor(interval_s=0.05)
    dm = DeviceMonitor(interval_s=0.05)
    hm.start(); dm.start()
    deadline = time.time() + 5.0
    while time.time() < deadline and (len(hm.samples) < 2
                                      or len(dm.samples) < 2):
        time.sleep(0.05)
    hm.stop(); dm.stop()
    assert len(hm.samples) >= 2
    assert len(dm.samples) >= 2
    assert "ram_used_gb" in hm.summary() or "cpu_percent" in hm.summary()


def test_profiling_decorators():
    class Thing:
        def __init__(self):
            self.profiler = InferixProfiler()

        @profile_session("sess")
        def run(self):
            self.work()
            return 42

        @profile_stage("work_stage")
        def work(self):
            time.sleep(0.01)

    t = Thing()
    assert t.run() == 42
    s = t.profiler.summary()
    assert s["session"] == "sess"
    assert "work_stage" in s["stages_ms"]
    assert s["stages_ms"]["work_stage"] >= 10.0


def test_event_path_timer():
    t = EventPathTimer()
    t.record("a")
    time.sleep(0.01)
    t.synced_record("b")
    spans = t.spans()
    assert "a->b" in spans and spans["a->b"] >= 0.01
    assert event_path_timer() is event_path_timer()


def test_interactive_session_thread_safety():
    """Hammer submit/pause/stop from threads while the worker evaluates
    checkpoints — latest-wins must hold and no exceptions may escape
    (the reference guards this with locks, session.py; here the same
    contract is stress-tested)."""
    import threading

    from inferix_tpu.core.interactive import InteractiveSession
    from inferix_tpu.core.types import GenerationCommand

    from inferix_tpu.core.types import InputApplyPolicy

    # IMMEDIATE: block checkpoints may consume (the default NEXT_SEGMENT
    # policy would defer everything here to a segment boundary)
    session = InteractiveSession(apply_policy=InputApplyPolicy.IMMEDIATE)
    errors = []
    stop_flag = threading.Event()

    def submitter(i):
        try:
            for j in range(200):
                session.submit_input(prompt=f"p{i}-{j}")
                if j % 50 == 0:
                    session.pause()
                    session.resume()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=submitter, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    seen = []
    for k in range(300):
        res = session.evaluate_checkpoint("block", k)
        if res.command == GenerationCommand.UPDATE_PROMPT:
            seen.append(res.new_prompt)
    for t in threads:
        t.join()
    assert not errors
    # after all submitters finish, exactly one pending input can remain
    final = session.evaluate_checkpoint("block", 9999)
    post = session.evaluate_checkpoint("block", 10000)
    assert post.command == GenerationCommand.CONTINUE
    assert len(seen) > 0  # interleaved updates were observed


def test_prompt_extension_system_prompts():
    from inferix_tpu.utils.prompt_extend import (
        LM_CH_SYS_PROMPT, LM_EN_SYS_PROMPT, VL_EN_SYS_PROMPT,
        PassthroughPromptExpander, PromptOutput, decide_system_prompt,
        detect_language,
    )

    assert detect_language("a cat on a boat") == "en"
    assert detect_language("一只猫在船上") == "ch"
    assert decide_system_prompt("t2v", prompt="hello") == LM_EN_SYS_PROMPT
    assert decide_system_prompt("t2v", prompt="你好世界") == LM_CH_SYS_PROMPT
    assert decide_system_prompt("i2v", prompt="hello") == VL_EN_SYS_PROMPT

    p = PassthroughPromptExpander()
    assert p("keep me", task="t2v") == "keep me"
    out = p.extend("x", "sys")
    assert isinstance(out, PromptOutput) and out.status and out.prompt == "x"


def test_diffusion_analyzer_aggregation():
    from inferix_tpu.profiling.diffusion_analyzer import DiffusionAnalyzer

    an = DiffusionAnalyzer()
    for s in range(4):
        an.record_diffusion_step(s, 1.0 - s * 0.25, 3, 600.0 + 10 * s)
    an.record_block_computation(0, 3, 1800.0, memory_usage_mb=9000)
    an.record_block_computation(1, 3, 1900.0, memory_usage_mb=9100)
    an.record_model_parameters("dit", 1_300_000_000, "diffusion")
    an.record_model_parameters("vae", 120_000_000, "vae")

    full = an.get_full_analysis()
    assert full["steps"]["total_steps"] == 4
    assert abs(full["steps"]["avg_computation_time_ms"] - 615.0) < 1e-6
    assert full["blocks"]["total_blocks"] == 2
    assert full["blocks"]["avg_frames_per_second"] > 1.0
    assert full["models"]["largest_model"] == "dit"
    cats = {r["category"] for r in full["recommendations"]}
    assert "diffusion_steps" in cats      # 615 ms > 500 ms threshold
    assert full["blocks"]["avg_block_size"] == 3


def test_extract_metrics_from_report(tmp_path):
    from inferix_tpu.profiling.extract_metrics import (
        aggregate_metrics, extract_metrics)
    from inferix_tpu.profiling.profiler import InferixProfiler, ProfilingConfig

    prof = InferixProfiler(ProfilingConfig(output_dir=str(tmp_path)))
    prof.start_session("s")
    with prof.stage("diffusion_generation"):
        pass
    prof.record_block_computation(0, 3, 400.0)
    prof.record_block_computation(1, 3, 850.0)
    prof.end_session()
    paths = prof.save_report(rank=0)
    m = extract_metrics(paths[0])
    assert m["num_blocks"] == 2
    # time_ms is the PER-BLOCK duration (single definition across the
    # producers, profiler.summary and extract_metrics)
    assert abs(m["avg_block_ms"] - 625.0) < 1e-6
    assert abs(m["frames_per_s"] - 1000.0 * 6 / 1250.0) < 1e-6
    agg = aggregate_metrics([paths[0], paths[0]])
    assert agg["ranks"] == 2
    assert agg["avg_block_ms"]["avg"] == m["avg_block_ms"]


def test_example_configs_parse():
    import glob
    import json as _json

    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.pipeline.magi import magi_config_from_json

    for path in glob.glob("examples/configs/*.json"):
        with open(path) as f:
            d = _json.load(f)
        if "magi" in path:
            mc, rc = magi_config_from_json(path)
            assert mc.num_layers > 0 and rc.num_steps > 0
        else:
            d.pop("_comment", None)
            cfg = EngineConfig.from_dict(d)
            assert cfg.runtime.num_frames > 0


def test_memory_analysis_chipless():
    """analyze_program compiles on abstract inputs (nothing device-resident)
    and reports argument/output sizes; donation shows up as alias."""
    import jax
    import jax.numpy as jnp

    from inferix_tpu.utils.memory_analysis import analyze_program

    f = jax.jit(lambda c, x: (x.sum(), c.at[0].add(1.0)),
                donate_argnums=(0,))
    m = analyze_program(f, jnp.zeros((1024, 1024), jnp.float32),
                        jnp.zeros((8, 128), jnp.float32))
    assert abs(m["argument_gib"] - (1024 * 1024 + 8 * 128) * 4 / 2**30) < 1e-6
    # the donated 4 MiB buffer aliases the output on backends that support
    # buffer donation (TPU always; CPU reports 0 — accept either)
    assert m["output_gib"] >= 1024 * 1024 * 4 / 2**30 - 1e-6


def test_interactive_apply_policy_boundaries():
    """NEXT_SEGMENT input must NOT be consumed at block checkpoints; it
    applies at the next segment boundary. NEXT_BLOCK applies at either."""
    from inferix_tpu.core.interactive import InteractiveSession
    from inferix_tpu.core.types import GenerationCommand, InputApplyPolicy

    s1 = InteractiveSession(apply_policy=InputApplyPolicy.NEXT_SEGMENT)
    s1.submit_input(prompt="later")
    assert s1.evaluate_checkpoint("block", 0).command \
        == GenerationCommand.CONTINUE
    res = s1.evaluate_checkpoint("segment", 0)
    assert res.command == GenerationCommand.UPDATE_PROMPT
    assert res.new_prompt == "later"
    # consumed exactly once
    assert s1.evaluate_checkpoint("segment", 1).command \
        == GenerationCommand.CONTINUE

    s2 = InteractiveSession(apply_policy=InputApplyPolicy.NEXT_BLOCK)
    s2.submit_input(prompt="now")
    assert s2.evaluate_checkpoint("block", 0).command \
        == GenerationCommand.UPDATE_PROMPT


def test_kv_manager_quantized_set_get_range():
    """set_range on an int8 cache must quantize + update the scale rows;
    get_range must return dequantized values (raw int8 would be garbage)."""
    import jax.numpy as jnp
    import numpy as np

    from inferix_tpu.kvcache.cache import KVCacheSpec
    from inferix_tpu.kvcache.manager import KVCacheManager, KVCacheRequest

    spec = KVCacheSpec(num_layers=2, batch=2, max_tokens=8, num_kv_heads=2,
                       head_dim=4, dtype=jnp.float32, quantized=True)
    mgr = KVCacheManager(spec)
    req = KVCacheRequest("r1")
    mgr.allocate_slots(req)
    rng = np.random.default_rng(0)
    kd = rng.standard_normal((4, 2, 4)).astype(np.float32) * 0.3
    vd = rng.standard_normal((4, 2, 4)).astype(np.float32) * 0.3
    mgr.set_range(req, layer_idx=1, start=2, k_data=kd, v_data=vd)
    k, v = mgr.get_range(req, layer_idx=1, start=2, length=4)
    # int8 quantization error bound: absmax/127 per (token, head) row
    np.testing.assert_allclose(np.asarray(k), kd, atol=0.3 / 127 + 1e-6)
    np.testing.assert_allclose(np.asarray(v), vd, atol=0.3 / 127 + 1e-6)
    # the scale rows were actually written (not left at zero)
    scales = np.asarray(mgr.cache.k_scale[1, 0, 2:6])
    assert (scales > 0).all()


def test_memory_manager_resident_use_does_not_evict():
    """use() of an already-resident component must not evict others
    (its bytes are already counted — the old double-count thrashed every
    other component on each use)."""
    import numpy as np

    from inferix_tpu.core.memory import AsyncMemoryManager

    mb = 1024 * 1024
    mgr = AsyncMemoryManager(budget_bytes=16 * mb)
    mgr.register("gen", {"w": np.zeros(9 * mb // 4, np.float32)})
    mgr.register("text", {"w": np.zeros(3 * mb // 4, np.float32)})
    with mgr.use("gen"):
        pass
    with mgr.use("text"):
        pass
    assert mgr._components["gen"].on_device
    assert mgr._components["text"].on_device
    # 9 + 3 = 12 < 16: using the resident generator again must keep the
    # text encoder on device
    with mgr.use("gen"):
        pass
    assert mgr._components["text"].on_device, (
        "resident use() evicted another component (budget double-count)")
