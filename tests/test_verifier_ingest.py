"""Real-data ingest parity fixtures (VERDICT r3 #7).

A fake CEDAR-style dataset tree is consumed EXACTLY like the reference's
grouping rules (``signature_verifier_train.py:261-316``): per-user
subdirectories when any exist, flat filename-prefix grouping otherwise,
the <2-signatures filter, the image-extension filter, and the synthetic
directory joining as the extra ``_synthetic_`` user (no minimum count, never
self-paired). The discovery test compares against an independent
transcription of the reference's logic so the first real-data run cannot
diverge silently; the CLI test drives ``cli/verifier_train`` end-to-end on
the fixture tree.
"""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from siggan_tpu.verify.pairs import (SYNTHETIC_USER, generate_pairs,
                                     load_user_signatures)

IMAGE_EXTENSIONS = {".png", ".jpg", ".jpeg", ".bmp", ".tiff"}


def _save(path: Path, seed: int) -> None:
    rs = np.random.RandomState(seed)
    arr = np.full((48, 48), 255, np.uint8)
    arr[10 + seed % 20:16 + seed % 20, 5:43] = rs.randint(0, 90)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture()
def cedar_tree(tmp_path):
    """Per-user CEDAR-style tree with every grouping edge the reference's
    loader handles: a healthy user, a 2-signature minimum user, a 1-signature
    user (must be DROPPED entirely), a non-image file (ignored), and a
    synthetic dir holding a single image (kept — no minimum applies)."""
    root = tmp_path / "cedar"
    for i in range(4):
        _save(root / "writer_007" / f"original_7_{i}.png", i)
    for i in range(2):
        _save(root / "writer_012" / f"original_12_{i}.jpg", 10 + i)
    _save(root / "writer_099" / "original_99_0.png", 20)      # dropped: 1 sig
    (root / "writer_007" / "notes.txt").write_text("not an image")
    synth = tmp_path / "synthetic"
    _save(synth / "gen_0.png", 30)
    return root, synth


def _reference_discovery(data_dir: Path, synthetic_dir: Path | None):
    """Independent transcription of signature_verifier_train.py:261-316."""
    user_signatures = {}
    subdirs = [d for d in data_dir.iterdir() if d.is_dir()]
    if subdirs:
        for user_dir in subdirs:
            imgs = [f for f in user_dir.iterdir()
                    if f.suffix.lower() in IMAGE_EXTENSIONS]
            if len(imgs) >= 2:
                user_signatures[user_dir.name] = imgs
    else:
        for f in data_dir.iterdir():
            if f.suffix.lower() not in IMAGE_EXTENSIONS:
                continue
            parts = f.stem.split("_")
            user_signatures.setdefault(parts[0] if parts else f.stem,
                                       []).append(f)
        user_signatures = {k: v for k, v in user_signatures.items()
                           if len(v) >= 2}
    if synthetic_dir is not None and synthetic_dir.exists():
        imgs = [f for f in synthetic_dir.iterdir()
                if f.suffix.lower() in IMAGE_EXTENSIONS]
        if imgs:
            user_signatures["_synthetic_"] = imgs
    return {k: sorted(v) for k, v in user_signatures.items()}


def test_cedar_tree_discovery_matches_reference_rules(cedar_tree):
    root, synth = cedar_tree
    ours = {k: sorted(v)
            for k, v in load_user_signatures(root, synth).items()}
    ref = _reference_discovery(root, synth)
    assert ours == ref
    assert set(ours) == {"writer_007", "writer_012", SYNTHETIC_USER}
    assert len(ours["writer_007"]) == 4          # notes.txt ignored
    assert len(ours[SYNTHETIC_USER]) == 1        # no minimum for synthetic


def test_flat_prefix_grouping_matches_reference_rules(tmp_path):
    # Flat variant incl. the no-underscore edge (user id = whole stem) and
    # the <2 filter.
    for name, seed in (("user001_sig1.png", 0), ("user001_sig2.png", 1),
                       ("user002_a.png", 2), ("user002_b.png", 3),
                       ("user002_c.png", 4), ("loner_x.png", 5),
                       ("README.md", 6)):
        if name.endswith(".md"):
            (tmp_path / name).write_text("docs")
        else:
            _save(tmp_path / name, seed)
    ours = {k: sorted(v) for k, v in load_user_signatures(tmp_path).items()}
    ref = _reference_discovery(tmp_path, None)
    assert ours == ref
    assert set(ours) == {"user001", "user002"}   # "loner" filtered (<2)


def test_pair_generation_counts_and_synthetic_role(cedar_tree):
    root, synth = cedar_tree
    users = load_user_signatures(root, synth)
    pairs = generate_pairs(users, pairs_per_user=6, seed=3)
    # 2 real users x (6 genuine + 6 impostor); synthetic drives no loop.
    assert len(pairs) == 2 * 12
    genuine = [(a, b) for a, b, l in pairs if l == 1]
    assert len(genuine) == 12
    for a, b in genuine:
        assert a.parent == b.parent and a.parent.name != SYNTHETIC_USER
    # synthetic images appear among negatives (both real users can draw it)
    assert any(synth in a.parents or synth in b.parents
               for a, b, l in pairs if l == 0)


@pytest.mark.slow  # two full (tiny) verifier trainings, compile-heavy
def test_verifier_train_cli_consumes_fixture_tree(cedar_tree, tmp_path):
    """End-to-end: the train CLI ingests the CEDAR tree + synthetic dir and
    produces baseline AND augmented checkpoints + history JSON."""
    from siggan_tpu.cli.verifier_train import main

    root, synth = cedar_tree
    out = tmp_path / "models"
    rc = main(["--data_dir", str(root), "--synthetic_dir", str(synth),
               "--output_dir", str(out), "--epochs", "1",
               "--batch_size", "8", "--pairs_per_user", "4",
               "--embedding_dim", "16", "--seed", "0"])
    assert rc == 0
    assert (out / "verifier_baseline.pkl").exists()
    assert (out / "verifier_augmented.pkl").exists()
    hist = json.loads((out / "training_history.json").read_text())
    assert set(hist) == {"baseline", "augmented"}
    for r in hist.values():
        assert 0.0 <= r["best_val_accuracy"] <= 1.0
