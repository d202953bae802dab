"""Real VBench metric plug-ins (torch/CPU) for the VDE harness.

The reference scores LV-Bench with trained models
(`LV-Bench/metrics.py:13-260`): MUSIQ-SPAQ for clarity, AMT-S for motion
smoothness, RAFT for dynamic degree, DINO ViT-B/16 for subject
consistency, CLIP ViT-B/32 for background consistency, CLIP ViT-L/14 +
LAION head for aesthetics. `eval/flow_metrics.py` ships weight-free
proxies for drift TRACKING; this module wires the REAL models — each
plug-in loads from a weights path when provided, so the BASELINE "VBench
delta <= 0.5" acceptance becomes measurable the moment real checkpoints
exist (SURVEY.md §7.11: evaluation stays a torch/CPU sidecar).

Interface contract: every plug-in is a callable `chunk -> float` over a
numpy video chunk [T, H, W, 3] in [0, 1] — IDENTICAL to the proxies in
`eval/vde.py` / `eval/flow_metrics.py`, so `register_real_metrics`
swaps them into `BUILTIN_METRICS` transparently.

Model sources:
* CLIP / DINO / aesthetic: HF `transformers` (baked into the image) —
  `CLIPVisionModelWithProjection` / `ViTModel` from a local checkpoint
  directory (openai/clip-vit-base-patch32, facebook/dino-vitb16 layouts).
* RAFT: `eval/raft.py`, our from-scratch torch RAFT loading the official
  `raft-things.pth`.
* MUSIQ / AMT: the reference consumes these through pyiqa / the vendored
  vbench third_party package (`metrics.py:178-200`); the plug-ins defer to
  those packages when importable and raise a clear ImportError otherwise
  (this image ships neither — the MUSIQ-style proxy remains the default).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np

MetricFn = Callable[[np.ndarray], float]

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _resize_frames(chunk: np.ndarray, size: int) -> "torch.Tensor":
    """[T, H, W, 3] in [0,1] -> torch [T, 3, size, size] bicubic (the
    vbench clip/dino transforms resize to 224)."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(np.ascontiguousarray(chunk)).float()
    x = x.permute(0, 3, 1, 2)
    return F.interpolate(x, size=(size, size), mode="bicubic",
                         align_corners=False, antialias=True)


def _consistency_score(feats: "torch.Tensor") -> float:
    """VBench subject/background consistency: mean over frames t>0 of
    (max(0, cos(f_{t-1}, f_t)) + max(0, cos(f_0, f_t))) / 2
    (`LV-Bench/metrics.py:84-139`)."""
    import torch.nn.functional as F

    feats = F.normalize(feats, dim=-1, p=2)
    sim, cnt = 0.0, 0
    for i in range(1, feats.shape[0]):
        sim_pre = max(0.0, float(F.cosine_similarity(
            feats[i - 1:i], feats[i:i + 1])))
        sim_fir = max(0.0, float(F.cosine_similarity(
            feats[0:1], feats[i:i + 1])))
        sim += (sim_pre + sim_fir) / 2
        cnt += 1
    return sim / max(cnt, 1)


class CLIPBackgroundConsistency:
    """background consistency via CLIP image embeddings
    (reference compute_background_consistency, metrics.py:108-139)."""

    def __init__(self, weights_path: str, device: str = "cpu"):
        import torch
        from transformers import CLIPVisionModelWithProjection

        self.device = device
        self.model = CLIPVisionModelWithProjection.from_pretrained(
            weights_path).to(device).eval()
        self.size = self.model.config.image_size
        self._torch = torch

    def __call__(self, chunk: np.ndarray) -> float:
        torch = self._torch
        x = _resize_frames(chunk, self.size)
        x = (x - torch.from_numpy(_CLIP_MEAN).view(1, 3, 1, 1)) \
            / torch.from_numpy(_CLIP_STD).view(1, 3, 1, 1)
        with torch.no_grad():
            feats = self.model(pixel_values=x.to(self.device)).image_embeds
        return _consistency_score(feats)


class DINOSubjectConsistency:
    """subject consistency via DINO ViT-B/16 CLS features
    (reference compute_subject_consistency, metrics.py:84-106)."""

    def __init__(self, weights_path: str, device: str = "cpu"):
        import torch
        from transformers import ViTModel

        self.device = device
        self.model = ViTModel.from_pretrained(weights_path).to(device).eval()
        self.size = self.model.config.image_size
        self._torch = torch

    def __call__(self, chunk: np.ndarray) -> float:
        torch = self._torch
        x = _resize_frames(chunk, self.size)
        x = (x - torch.from_numpy(_IMAGENET_MEAN).view(1, 3, 1, 1)) \
            / torch.from_numpy(_IMAGENET_STD).view(1, 3, 1, 1)
        with torch.no_grad():
            out = self.model(pixel_values=x.to(self.device))
        return _consistency_score(out.last_hidden_state[:, 0])


class LAIONAesthetic:
    """LAION aesthetic predictor: CLIP ViT-L/14 image embeds -> linear head
    (reference metrics.py:206-219, vbench aesthetic_quality). head_path is
    a torch state dict for the single nn.Linear(emb_dim, 1)."""

    def __init__(self, clip_path: str, head_path: str, device: str = "cpu"):
        import torch
        from transformers import CLIPVisionModelWithProjection

        self.device = device
        self.model = CLIPVisionModelWithProjection.from_pretrained(
            clip_path).to(device).eval()
        self.size = self.model.config.image_size
        emb = self.model.config.projection_dim
        self.head = torch.nn.Linear(emb, 1)
        sd = torch.load(head_path, map_location="cpu", weights_only=True)
        self.head.load_state_dict(sd)
        self.head.to(device).eval()
        self._torch = torch

    def __call__(self, chunk: np.ndarray) -> float:
        torch = self._torch
        x = _resize_frames(chunk, self.size)
        x = (x - torch.from_numpy(_CLIP_MEAN).view(1, 3, 1, 1)) \
            / torch.from_numpy(_CLIP_STD).view(1, 3, 1, 1)
        with torch.no_grad():
            feats = self.model(pixel_values=x.to(self.device)).image_embeds
            feats = torch.nn.functional.normalize(feats, dim=-1, p=2)
            scores = self.head(feats)
        # vbench normalizes the 1-10 LAION score to [0, 1]
        return float(scores.mean()) / 10.0


class RAFTDynamicDegree:
    """dynamic degree via RAFT flow (reference vbench DynamicDegree,
    `LV-Bench/vbench/dynamic_degree.py:27-98`): per frame pair, mean of
    the top-5% flow magnitudes; the video "moves" if enough pairs exceed
    a resolution-scaled threshold. Returns the moving-pair fraction (a
    graded version of the reference's boolean; thresholding at >=
    count_num/len reproduces the boolean)."""

    def __init__(self, weights_path: str, device: str = "cpu",
                 iters: int = 20):
        import torch

        from .raft import load_raft, pad_to_multiple_of_8

        self.model = load_raft(weights_path, device)
        self.device = device
        self.iters = iters
        self._torch = torch
        self._pad = pad_to_multiple_of_8

    def _pair_score(self, f1, f2) -> float:
        torch = self._torch
        with torch.no_grad():
            _, flow = self.model(f1, f2, iters=self.iters, test_mode=True)
        rad = torch.sqrt(flow[0, 0] ** 2 + flow[0, 1] ** 2)
        flat = rad.flatten()
        k = max(1, int(flat.numel() * 0.05))
        return float(torch.topk(flat, k).values.mean())

    def __call__(self, chunk: np.ndarray) -> float:
        torch = self._torch
        frames = torch.from_numpy(
            np.ascontiguousarray(chunk)).float().permute(0, 3, 1, 2) * 255.0
        frames = self._pad(frames).to(self.device)
        scale = min(frames.shape[-2:])
        thres = 6.0 * (scale / 256.0)
        moving = 0
        for i in range(frames.shape[0] - 1):
            s = self._pair_score(frames[i:i + 1], frames[i + 1:i + 2])
            if s > thres:
                moving += 1
        return moving / max(frames.shape[0] - 1, 1)


class MUSIQClarity:
    """clarity via pyiqa MUSIQ (the reference's exact model,
    metrics.py:178-192). Defers to pyiqa — this image does not ship it;
    `flow_metrics.musiq_style_clarity` is the weight-free default."""

    def __init__(self, weights_path: Optional[str] = None,
                 device: str = "cpu"):
        try:
            from pyiqa.archs.musiq_arch import MUSIQ
        except ImportError as e:
            raise ImportError(
                "MUSIQ clarity needs pyiqa (not shipped in this image); "
                "use the musiq_style_clarity proxy or install pyiqa"
            ) from e
        import torch

        self.model = MUSIQ(pretrained_model_path=weights_path)
        self.model.to(device)
        # .eval() recurses into submodules (dropout/batchnorm); setting
        # .training directly would only flip the top-level module
        self.model.eval()
        self.device = device
        self._torch = torch

    def __call__(self, chunk: np.ndarray) -> float:
        torch = self._torch
        x = torch.from_numpy(np.ascontiguousarray(chunk)).float()
        x = x.permute(0, 3, 1, 2).to(self.device)
        with torch.no_grad():
            scores = self.model(x)
        return float(scores.mean())


class AMTMotionSmoothness:
    """motion smoothness via AMT-S interpolation (reference
    metrics.py:195-204, vbench MotionSmoothness) — served by the IN-REPO
    AMT-S re-derivation (`eval/amt.py`, oracle-parity-tested against the
    reference's vendored implementation in tests/test_amt.py). Loads the
    official amt-s.pth; `flow_metrics.optical_flow_motion_smoothness` is
    the weight-free default. [r4: the vbench-package import dependency is
    gone.]"""

    def __init__(self, ckpt: str, device: str = "cpu", config: str = ""):
        from .amt import MotionSmoothnessAMT

        # `config` accepted for reference-CLI compatibility (AMT-S.yaml
        # only names the architecture; the in-repo class IS AMT-S)
        self.motion = MotionSmoothnessAMT(ckpt, device=device)

    def __call__(self, chunk: np.ndarray) -> float:
        return float(self.motion(chunk))


REAL_METRIC_BUILDERS: Dict[str, Callable[..., MetricFn]] = {
    "background_consistency": CLIPBackgroundConsistency,
    "subject_consistency": DINOSubjectConsistency,
    "aesthetic": LAIONAesthetic,
    "dynamic": RAFTDynamicDegree,
    "clarity": MUSIQClarity,
    "motion": AMTMotionSmoothness,
}


def register_real_metrics(weights: Dict[str, Dict], device: str = "cpu"
                          ) -> Dict[str, MetricFn]:
    """Instantiate real metrics from a {name: builder-kwargs} spec and
    register them into `vde.BUILTIN_METRICS` (replacing the proxies of the
    same name). Returns the instantiated metrics. Example:

        register_real_metrics({
            "background_consistency": {"weights_path": ".../clip-vit-b32"},
            "dynamic": {"weights_path": ".../raft-things.pth"},
        })
    """
    from .vde import BUILTIN_METRICS

    built: Dict[str, MetricFn] = {}
    for name, kwargs in weights.items():
        if name not in REAL_METRIC_BUILDERS:
            raise ValueError(
                f"unknown real metric {name!r}; "
                f"available: {sorted(REAL_METRIC_BUILDERS)}")
        fn = REAL_METRIC_BUILDERS[name](device=device, **kwargs)
        BUILTIN_METRICS[name] = fn
        built[name] = fn
    return built
