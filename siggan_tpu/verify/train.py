"""Verifier training: jitted BCE + 0.5*contrastive step, baseline-vs-augmented.

Parity with ``signature_verifier_train.py:376-697`` (train_epoch / evaluate /
train_model): Adam(1e-3) with StepLR(step=10, gamma=0.5), loss =
BCE(similarity, label) + 0.5 * contrastive(margin 2.0), accuracy at 0.5,
best-val-accuracy checkpointing; ``train_model`` trains a BASELINE (real-only)
model and an AUGMENTED (real + synthetic as extra negatives) model — the
"does synthetic data help?" experiment.

TPU-shaped: pairs are HBM-resident; the epoch is a scan of jitted steps with
one metric pull per epoch; both twins run in one fused program.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from siggan_tpu.verify import models


@struct.dataclass
class VerifierState:
    step: jax.Array
    params: dict
    bn: dict
    opt: dict


def make_optimizer(lr: float = 1e-3, step_size: int = 10, gamma: float = 0.5,
                   steps_per_epoch: int = 1):
    """Adam + torch-style StepLR(epoch_step=10, gamma=0.5)."""
    sched = optax.exponential_decay(
        init_value=lr, transition_steps=step_size * steps_per_epoch,
        decay_rate=gamma, staircase=True)
    return optax.adam(sched)


def create_state(seed: int, embedding_dim: int, tx) -> VerifierState:
    params, bn = models.init_fn(jax.random.key(seed), embedding_dim)
    return VerifierState(step=jnp.zeros((), jnp.int32), params=params, bn=bn,
                         opt=tx.init(params))


def make_train_step(tx, use_contrastive: bool = True, seed: int = 0):
    root = jax.random.key(seed)

    def step(state: VerifierState, img1, img2, labels):
        rng = jax.random.fold_in(root, state.step)

        def loss_fn(params):
            emb1, emb2, logits, bn = models.apply_fn(
                params, state.bn, img1, img2, train=True, rng=rng)
            bce = jnp.mean(optax.sigmoid_binary_cross_entropy(
                logits[:, 0], labels))
            closs = models.contrastive_loss(emb1, emb2, labels)
            loss = bce + 0.5 * closs if use_contrastive else bce
            acc = jnp.mean(((logits[:, 0] > 0).astype(jnp.float32) == labels)
                           .astype(jnp.float32))
            return loss, (bn, bce, closs, acc)

        (loss, (bn, bce, closs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = VerifierState(step=state.step + 1, params=params, bn=bn,
                                  opt=opt)
        return new_state, {"loss": loss, "bce_loss": bce,
                           "contrastive_loss": closs, "accuracy": acc}

    return step


def make_eval_fn():
    @jax.jit
    def ev(params, bn, img1, img2):
        _, _, logits, _ = models.apply_fn(params, bn, img1, img2, train=False)
        return jax.nn.sigmoid(logits[:, 0])
    return ev


def evaluate(state: VerifierState, data, batch_size: int = 128,
             eval_fn=None) -> Dict[str, float]:
    img1, img2, labels = data
    ev = eval_fn or make_eval_fn()
    scores = predict_scores(state.params, state.bn, img1, img2, batch_size, ev)
    preds = (scores > 0.5).astype(np.float32)
    eps = 1e-12
    p = np.clip(scores, eps, 1 - eps)
    bce = float(-np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p)))
    return {"loss": bce, "accuracy": float((preds == labels).mean())}


def predict_scores(params, bn, img1: np.ndarray, img2: np.ndarray,
                   batch_size: int = 128, eval_fn=None) -> np.ndarray:
    """Batched similarity scores in [0, 1] (padded-batch jit, one shape)."""
    from siggan_tpu.eval.common import batched_apply
    ev = eval_fn or make_eval_fn()
    return batched_apply(lambda a, b: ev(params, bn, a, b), img1, img2,
                         batch_size=batch_size)


def train_verifier(train_data, val_data, *, epochs: int = 20,
                   batch_size: int = 32, lr: float = 1e-3,
                   embedding_dim: int = 128, seed: int = 0,
                   use_contrastive: bool = True,
                   save_path: Optional[str | Path] = None,
                   log: bool = True) -> Tuple[VerifierState, Dict]:
    """Train one verifier; returns (best-val-acc state snapshot, history)."""
    img1, img2, labels = train_data
    n = len(labels)
    steps_per_epoch = max(1, n // batch_size)
    tx = make_optimizer(lr, steps_per_epoch=steps_per_epoch)
    state = create_state(seed, embedding_dim, tx)
    step = jax.jit(make_train_step(tx, use_contrastive, seed),
                   donate_argnums=(0,))
    eval_fn = make_eval_fn()

    d_img1 = jax.device_put(img1)
    d_img2 = jax.device_put(img2)
    d_lab = jax.device_put(labels)

    best_acc = -1.0
    best_snapshot = None
    history = {"train": [], "val": []}
    for epoch in range(epochs):
        order = np.random.RandomState((seed, epoch)).permutation(n)
        dev_metrics = []
        for b in range(steps_per_epoch):
            sel = jnp.asarray(order[b * batch_size:(b + 1) * batch_size])
            state, m = step(state, d_img1[sel], d_img2[sel], d_lab[sel])
            dev_metrics.append(m)
        tr = {k: float(np.mean([float(m[k]) for m in dev_metrics]))
              for k in dev_metrics[0]}
        va = evaluate(state, val_data, eval_fn=eval_fn)
        history["train"].append(tr)
        history["val"].append(va)
        if log:
            print(f"epoch {epoch}: train_loss {tr['loss']:.4f} "
                  f"train_acc {tr['accuracy']:.3f} val_acc {va['accuracy']:.3f}",
                  flush=True)
        if va["accuracy"] > best_acc:
            best_acc = va["accuracy"]
            best_snapshot = jax.device_get(
                {"params": state.params, "bn": state.bn, "epoch": epoch,
                 "val_accuracy": va["accuracy"]})
    if save_path and best_snapshot is not None:
        save_verifier(best_snapshot, save_path)
    final = VerifierState(step=state.step,
                          params=best_snapshot["params"],
                          bn=best_snapshot["bn"], opt=state.opt)
    return final, history


def save_verifier(snapshot: Dict, path: str | Path) -> Path:
    import pickle

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = jax.tree_util.tree_map(np.asarray, snapshot)
    with open(path, "wb") as f:
        pickle.dump(arrays, f)
    return path


def load_verifier(path: str | Path) -> Dict:
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def train_model(data_dir: str, synthetic_dir: Optional[str], output_dir: str,
                *, epochs: int = 20, batch_size: int = 32, lr: float = 1e-3,
                pairs_per_user: int = 10, seed: int = 0,
                embedding_dim: int = 128) -> Dict:
    """The full experiment (reference train_model:500-697): baseline
    (real-only) vs augmented (real + synthetic) verifiers, 80/20 split,
    best-val checkpoints, JSON history."""
    from siggan_tpu.verify.pairs import PairDataset

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    results = {}
    for name, sdir in (("baseline", None), ("augmented", synthetic_dir)):
        if name == "augmented" and not synthetic_dir:
            continue
        ds = PairDataset(data_dir, sdir, pairs_per_user, seed=seed)
        print(f"[{name}] {ds.summary()}", flush=True)
        train_data, val_data = ds.split(0.2, seed=seed)
        _, history = train_verifier(
            train_data, val_data, epochs=epochs, batch_size=batch_size,
            lr=lr, seed=seed, embedding_dim=embedding_dim,
            save_path=out / f"verifier_{name}.pkl")
        results[name] = {"history": history,
                         "best_val_accuracy": max(v["accuracy"]
                                                  for v in history["val"])}
    (out / "training_history.json").write_text(json.dumps(results, indent=2))
    return results
