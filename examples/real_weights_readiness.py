"""Real-weights readiness check (VERDICT r3 item 8).

No released checkpoints exist in this environment (zero egress), so every
loader is oracle-tested against synthetic torch state dicts instead. This
script is the pre-written integration path for the day weights appear:
point the env vars at checkpoint files and it loads them, generates one
3-frame block, VAE-decodes it, and runs a VDE smoke over the pixels —
exiting cleanly (rc=0, with guidance) when no checkpoint is configured.

  SELF_FORCING_CKPT  Self-Forcing 1.3B DiT state dict (.pt/.pth/.bin or dir)
                     (reference load path:
                     inferix/pipeline/self_forcing/pipeline.py:87-125)
  WAN_VAE_CKPT       Wan causal 3D VAE state dict (optional: without it the
                     run stays NO_DECODE and the VDE smoke is skipped)
  UMT5_CKPT          UMT5-XXL encoder weights directory (optional: without
                     it the prompt is encoded as zeros, as in the parity
                     tests)

Usage:  python examples/real_weights_readiness.py [--int8] [--prompt "..."]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default="a red panda climbing a snowy tree")
    ap.add_argument("--int8", action="store_true",
                    help="serve with W8A8 int8 linears + int8 KV cache "
                         "(the measured headline config)")
    ap.add_argument("--output", default="readiness_smoke.json")
    args = ap.parse_args()

    ckpt = os.environ.get("SELF_FORCING_CKPT")
    vae_ckpt = os.environ.get("WAN_VAE_CKPT")
    umt5_ckpt = os.environ.get("UMT5_CKPT")
    if not ckpt:
        print("SELF_FORCING_CKPT is not set — no checkpoint to validate.\n"
              "When weights land:\n"
              "  SELF_FORCING_CKPT=/path/to/self_forcing_dmd.pt \\\n"
              "  WAN_VAE_CKPT=/path/to/Wan2.1_VAE.pth \\\n"
              "  UMT5_CKPT=/path/to/umt5-xxl \\\n"
              "  python examples/real_weights_readiness.py --int8\n"
              "Everything downstream (loader, pipeline, decode, VDE) is "
              "already oracle-tested; this script only needs real files.")
        return 0

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from inferix_tpu.core.config import EngineConfig
    from inferix_tpu.core.types import DecodeMode
    from inferix_tpu.pipeline.self_forcing import SelfForcingPipeline

    cfg = EngineConfig()
    cfg.model_path = ckpt
    cfg.runtime.num_frames = 3  # one block
    if args.int8:
        cfg.quant.enabled = True
        cfg.quant.quantize_kv_cache = True
    report = {"checkpoint": ckpt, "int8": args.int8}

    vae = None
    if vae_ckpt:
        from inferix_tpu.utils.checkpoint import load_wan_vae

        t0 = time.perf_counter()
        vae = load_wan_vae(vae_ckpt)
        report["vae_load_s"] = round(time.perf_counter() - t0, 1)

    text_encoder = None
    if umt5_ckpt:
        from inferix_tpu.models.text.umt5 import (
            UMT5Config, WanTextEncoder, convert_t5_encoder_state_dict)
        from inferix_tpu.utils.checkpoint import load_torch_state_dict

        t0 = time.perf_counter()
        tcfg = UMT5Config()  # umt5-xxl defaults
        sd = load_torch_state_dict(umt5_ckpt)
        tparams = convert_t5_encoder_state_dict(sd, tcfg)
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained("google/umt5-xxl")
        except Exception:
            tok = None
            print("umt5 tokenizer unavailable; zero-context encode")
        text_encoder = WanTextEncoder(tcfg, params=tparams, tokenizer=tok,
                                      stream_layers=True)
        report["umt5_load_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    pipe = SelfForcingPipeline(cfg, vae=vae, text_encoder=text_encoder)
    pipe.setup()
    report["dit_load_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    decode = DecodeMode.AFTER_ALL if vae is not None else DecodeMode.NO_DECODE
    out = pipe.run_text_to_video([args.prompt], num_frames=3,
                                 decode_mode=decode, return_latents=True)
    video, latents = (out if isinstance(out, tuple) else (None, out))
    report["generate_s"] = round(time.perf_counter() - t0, 1)
    import numpy as np

    report["latents_finite"] = bool(np.isfinite(np.asarray(latents)).all())

    if video is not None:
        from inferix_tpu.eval.flow_metrics import register_flow_metrics
        from inferix_tpu.eval.vde import evaluate_video

        register_flow_metrics()
        px = np.asarray(video[0], np.float32)
        px = (px - px.min()) / max(px.max() - px.min(), 1e-6)
        report["pixels_shape"] = list(px.shape)
        report["vde_smoke"] = evaluate_video(px, n_chunks=2)

    print(json.dumps(report, indent=1, default=str))
    with open(args.output, "w") as f:
        json.dump(report, f, indent=1, default=str)
    ok = report["latents_finite"]
    print("READY" if ok else "NOT READY")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
