"""VDE harness: formula parity with the reference math + metric behaviors."""
import numpy as np
import pytest

from inferix_tpu.eval.vde import (
    BUILTIN_METRICS,
    evaluate_video,
    quality_delta,
    split_chunks,
    vde,
)


def test_vde_formula_matches_reference_math():
    """Hand-compute the reference vde() (LV-Bench/vde.py:17-46)."""
    scores = np.array([2.0, 2.2, 1.8, 2.0])
    chunks = np.zeros((4, 1, 1, 1, 3))
    it = iter(scores)
    got = vde(chunks, lambda c: float(next(it)), weight_type="linear")

    n = 4
    drift = np.abs(scores[1:] - scores[0]) / scores[0]
    weights = n - np.arange(2, n + 1) + 1  # [3, 2, 1]
    want = float(np.sum(weights * drift))
    assert got == pytest.approx(want)


def test_vde_log_weights_and_edge_cases():
    chunks = np.zeros((3, 1, 1, 1, 3))
    vals = iter([1.0, 1.5, 1.0])
    got = vde(chunks, lambda c: float(next(vals)), weight_type="log")
    want = np.log(2) * 0.5 + np.log(1) * 0.0
    assert got == pytest.approx(want)

    assert vde(chunks[:1], lambda c: 1.0) == 0.0
    z = iter([0.0, 1.0, 1.0])
    assert vde(chunks, lambda c: float(next(z))) == float("inf")


def test_split_chunks():
    video = np.random.default_rng(0).random((23, 4, 4, 3))
    chunks = split_chunks(video, 5)
    assert chunks.shape == (5, 4, 4, 4, 3)
    np.testing.assert_array_equal(chunks[0], video[:4])


def test_builtin_metrics_sane():
    rng = np.random.default_rng(1)
    static = np.repeat(rng.random((1, 16, 16, 3)), 8, axis=0)
    noisy = rng.random((8, 16, 16, 3))

    # a static video is smoother, less dynamic, and more consistent
    assert BUILTIN_METRICS["motion"](static) > BUILTIN_METRICS["motion"](noisy)
    assert BUILTIN_METRICS["dynamic"](static) < BUILTIN_METRICS["dynamic"](noisy)
    assert BUILTIN_METRICS["subject_consistency"](static) > \
        BUILTIN_METRICS["subject_consistency"](noisy)


def test_evaluate_and_delta():
    rng = np.random.default_rng(2)
    video = rng.random((40, 16, 16, 3))
    scores = evaluate_video(video, n_chunks=4)
    assert set(scores) == set(BUILTIN_METRICS)
    assert all(np.isfinite(v) for v in scores.values())

    # identical videos -> zero delta; different -> positive
    d0 = quality_delta(video, video, n_chunks=4)
    assert all(v == 0.0 for v in d0.values())
    d1 = quality_delta(video, rng.random((40, 16, 16, 3)), n_chunks=4)
    assert any(v > 0 for v in d1.values())


def test_factory_covers_reference_metric_names():
    """Every metric name the reference factory dispenses
    (LV-Bench/metrics.py:145-260: brightness, clarity, motion, aesthetic,
    dynamic, subject/background consistency) resolves here too."""
    import numpy as np

    from inferix_tpu.eval.vde import BUILTIN_METRICS, create_metric_func

    for name in ("brightness", "clarity", "motion", "aesthetic", "dynamic",
                 "subject_consistency", "background_consistency"):
        fn = create_metric_func(name)
        chunk = np.random.default_rng(0).random((4, 16, 16, 3)) \
            .astype(np.float32)
        assert np.isfinite(fn(chunk))
    assert BUILTIN_METRICS["brightness"](np.full((2, 4, 4, 3), 0.25,
                                                 np.float32)) == 0.25
