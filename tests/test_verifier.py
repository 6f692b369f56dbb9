"""Verifier subsystem tests: model contract, pair generation, metrics
parity with sklearn formulas, and a learning smoke test."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from siggan_tpu.verify import models
from siggan_tpu.verify.metrics import (compute_eer_from_scores,
                                       compute_verification_metrics)
from siggan_tpu.verify.pairs import PairDataset, generate_pairs, load_user_signatures
from siggan_tpu.verify.train import (evaluate, load_verifier, make_eval_fn,
                                     train_verifier)


def test_siamese_contract():
    params, state = models.init_fn(jax.random.key(0))
    x1 = jnp.zeros((4, 64, 64, 1))
    x2 = jnp.ones((4, 64, 64, 1)) * 0.5
    emb1, emb2, logits, new_state = models.apply_fn(
        params, state, x1, x2, train=True, rng=jax.random.key(1))
    assert emb1.shape == (4, 128) and logits.shape == (4, 1)
    # embeddings are L2-normalized
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb1), axis=1), 1.0,
                               rtol=1e-4)
    # BN state updated in train mode
    assert not np.allclose(np.asarray(new_state["bn"][0]["mean"]),
                           np.asarray(state["bn"][0]["mean"]))


def test_contrastive_loss_semantics():
    e1 = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    e2 = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    # same pair identical -> 0; different pair far apart -> pushed by margin
    same = models.contrastive_loss(e1[:1], e2[:1], jnp.asarray([1.0]))
    diff_close = models.contrastive_loss(e1[:1], e2[:1], jnp.asarray([0.0]))
    assert float(same) < 1e-6
    assert float(diff_close) > 0  # identical but labeled different -> penalty


@pytest.fixture()
def user_dirs(tmp_path):
    root = tmp_path / "real"
    root.mkdir()
    rs = np.random.RandomState(0)
    for u in range(4):
        d = root / f"user{u:03d}"
        d.mkdir()
        for s in range(4):
            # users are strongly separable: a thick black band in a
            # user-specific quadrant, plus per-signature jitter
            arr = np.full((64, 64), 255, np.uint8)
            y0 = 4 + u * 15
            arr[y0:y0 + 12, 4:60] = 0
            arr[50:54, 10 + s * 5:30 + s * 5] = rs.randint(0, 80)
            Image.fromarray(arr).save(d / f"sig_{s}.png")
    return root


def test_pair_generation_subdirs(user_dirs):
    users = load_user_signatures(user_dirs)
    assert len(users) == 4
    pairs = generate_pairs(users, pairs_per_user=5, seed=0)
    assert len(pairs) == 4 * 10  # 5 genuine + 5 impostor per user
    labels = [l for _, _, l in pairs]
    assert sum(labels) == 20
    # seeded determinism
    assert pairs == generate_pairs(users, pairs_per_user=5, seed=0)
    assert pairs != generate_pairs(users, pairs_per_user=5, seed=1)


def test_pair_generation_flat_prefix(tmp_path):
    rs = np.random.RandomState(0)
    for u in range(3):
        for s in range(3):
            arr = (rs.rand(64, 64) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / f"user{u}_sig{s}.png")
    users = load_user_signatures(tmp_path)
    assert set(users) == {"user0", "user1", "user2"}


def test_synthetic_user_only_negative(user_dirs, tmp_path):
    synth = tmp_path / "synthetic"
    synth.mkdir()
    rs = np.random.RandomState(1)
    for i in range(3):
        Image.fromarray((rs.rand(64, 64) * 255).astype(np.uint8)).save(
            synth / f"gen_{i}.png")
    users = load_user_signatures(user_dirs, synth)
    pairs = generate_pairs(users, pairs_per_user=5, seed=0)
    # synthetic user contributes no genuine pairs
    for a, b, label in pairs:
        if label == 1:
            assert a.parent != synth and b.parent != synth
    # but it does appear among impostor negatives
    assert any(a.parent == synth or b.parent == synth
               for a, b, label in pairs if label == 0)


def test_verification_metrics_formulas():
    y_true = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
    y_scores = np.array([0.9, 0.8, 0.4, 0.7, 0.3, 0.6, 0.1, 0.2], np.float32)
    y_pred = (y_scores > 0.5).astype(np.float32)
    m = compute_verification_metrics(y_true, y_scores, y_pred)
    # tp=3 fn=1 fp=1 tn=3
    assert m["true_positives"] == 3 and m["false_negatives"] == 1
    assert m["far"] == 1 / 4 and m["frr"] == 1 / 4
    assert m["accuracy"] == 6 / 8
    assert 0 <= m["eer"] <= 1 and 0 <= m["roc_auc"] <= 1
    eer, thr = compute_eer_from_scores(y_true, y_scores)
    assert abs(eer - m["eer"]) < 1e-9


@pytest.mark.slow
def test_verifier_learns_separable_pairs(user_dirs):
    ds = PairDataset(user_dirs, pairs_per_user=16, seed=0)
    assert ds.summary()["users"] == 4
    train_data, val_data = ds.split(0.25, seed=0)
    state, history = train_verifier(
        train_data, val_data, epochs=20, batch_size=32, seed=0, log=False)
    accs = [h["accuracy"] for h in history["val"]]
    # separable-by-construction users: eval-mode accuracy reaches ~1.0
    # (train-mode accuracy stays noisy due to the 0.5 encoder dropout)
    assert max(accs) >= 0.9, accs


@pytest.mark.slow
def test_save_load_roundtrip(user_dirs, tmp_path):
    ds = PairDataset(user_dirs, pairs_per_user=4, seed=0)
    train_data, val_data = ds.split(0.25, seed=0)
    path = tmp_path / "v.pkl"
    state, _ = train_verifier(train_data, val_data, epochs=2, batch_size=8,
                              seed=0, save_path=path, log=False)
    snap = load_verifier(path)
    assert "params" in snap and "val_accuracy" in snap
    from siggan_tpu.verify.eval import evaluate_model
    r = evaluate_model(snap, val_data)
    assert 0.0 <= r["metrics"]["accuracy"] <= 1.0
