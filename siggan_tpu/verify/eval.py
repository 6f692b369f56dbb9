"""Verifier evaluation pipeline: scoring, plots, comparison report.

Parity with ``signature_verifier_eval.py:506-1058``: batched similarity
scoring of seeded test pairs, compute_verification_metrics per model, ROC /
log-log DET / score-distribution (with EER threshold line) / grouped-bar
comparison plots, a JSON report with baseline-vs-augmented improvement
percentages, and a console comparison table.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from siggan_tpu.verify.metrics import (compute_verification_metrics,
                                       det_points, roc_points)
from siggan_tpu.verify.train import load_verifier, predict_scores

HIGHER_BETTER = {"accuracy", "roc_auc", "f1_score", "precision", "recall",
                 "specificity"}


def evaluate_model(snapshot: Dict, test_data, batch_size: int = 128,
                   threshold: float = 0.5) -> Dict[str, Any]:
    img1, img2, labels = test_data
    scores = predict_scores(snapshot["params"], snapshot["bn"], img1, img2,
                            batch_size)
    preds = (scores > threshold).astype(np.float32)
    metrics = compute_verification_metrics(labels, scores, preds, threshold)
    return {"metrics": metrics, "y_true": labels, "y_scores": scores,
            "metadata": {k: snapshot[k] for k in ("epoch", "val_accuracy")
                         if k in snapshot}}


# -- plots ------------------------------------------------------------------

def plot_roc(results: Dict[str, Dict], path: str | Path) -> Path:
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, r in results.items():
        fpr, tpr, _ = roc_points(r["y_true"], r["y_scores"])
        ax.plot(fpr, tpr, label=f"{name} (AUC {r['metrics']['roc_auc']:.3f})")
    ax.plot([0, 1], [0, 1], "k--", alpha=0.4)
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.set_title("ROC")
    ax.legend()
    return _save(fig, path)


def plot_det(results: Dict[str, Dict], path: str | Path) -> Path:
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, r in results.items():
        fpr, fnr = det_points(r["y_true"], r["y_scores"])
        m = (fpr > 0) & (fnr > 0)
        ax.loglog(fpr[m], fnr[m], label=name)
    ax.set_xlabel("False Acceptance Rate")
    ax.set_ylabel("False Rejection Rate")
    ax.set_title("DET (log-log)")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    return _save(fig, path)


def plot_score_distributions(results: Dict[str, Dict], path: str | Path) -> Path:
    fig, axes = plt.subplots(1, len(results), figsize=(6 * len(results), 4),
                             squeeze=False)
    for ax, (name, r) in zip(axes[0], results.items()):
        y, s = r["y_true"], r["y_scores"]
        ax.hist(s[y == 1], bins=30, alpha=0.6, label="genuine", density=True)
        ax.hist(s[y == 0], bins=30, alpha=0.6, label="forgery", density=True)
        ax.axvline(r["metrics"]["eer_threshold"], color="k", linestyle="--",
                   label=f"EER thr {r['metrics']['eer_threshold']:.2f}")
        ax.set_title(name)
        ax.set_xlabel("similarity score")
        ax.legend()
    return _save(fig, path)


def plot_metric_bars(results: Dict[str, Dict], path: str | Path,
                     keys=("accuracy", "far", "frr", "eer", "roc_auc",
                           "f1_score")) -> Path:
    names = list(results.keys())
    x = np.arange(len(keys))
    width = 0.8 / max(len(names), 1)
    fig, ax = plt.subplots(figsize=(9, 4.5))
    for i, name in enumerate(names):
        vals = [results[name]["metrics"][k] for k in keys]
        ax.bar(x + i * width, vals, width, label=name)
    ax.set_xticks(x + width * (len(names) - 1) / 2)
    ax.set_xticklabels(keys)
    ax.set_ylim(0, 1.05)
    ax.legend()
    ax.set_title("Verification metrics")
    return _save(fig, path)


def _save(fig, path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


# -- report -----------------------------------------------------------------

def generate_evaluation_report(results: Dict[str, Dict],
                               output_path: str | Path) -> Dict[str, Any]:
    report: Dict[str, Any] = {
        "evaluation_timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "num_models_evaluated": len(results),
        "models": {},
    }
    for name, data in results.items():
        report["models"][name] = {
            "model_metadata": data.get("metadata", {}),
            "metrics": data["metrics"],
            "num_test_samples": int(len(data["y_true"])),
            "genuine_samples": int(np.sum(data["y_true"] == 1)),
            "forgery_samples": int(np.sum(data["y_true"] == 0)),
        }
    if len(results) > 1:
        comparison: Dict[str, Any] = {}
        for metric in ("accuracy", "far", "frr", "eer", "roc_auc", "f1_score"):
            values = {n: d["metrics"][metric] for n, d in results.items()}
            pick = max if metric in HIGHER_BETTER else min
            comparison[metric] = {
                "values": values,
                "best_model": pick(values, key=values.get),
                "improvement": None,
            }
            if "baseline" in values and "augmented" in values:
                b, a = values["baseline"], values["augmented"]
                if metric in HIGHER_BETTER:
                    imp = (a - b) / b * 100 if b else None
                else:
                    imp = (b - a) / b * 100 if b else None
                comparison[metric]["improvement"] = (
                    round(imp, 2) if imp is not None else None)
        report["comparison"] = comparison
    path = Path(output_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(report, indent=2, default=_jsonable))
    return report


def _jsonable(o):
    """numpy scalars/arrays from checkpoint metadata -> plain python."""
    if isinstance(o, np.ndarray):
        return o.item() if o.ndim == 0 else o.tolist()
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


def print_comparison_table(results: Dict[str, Dict]) -> None:
    keys = ("accuracy", "far", "frr", "eer", "roc_auc", "f1_score")
    names = list(results.keys())
    print("=" * 70)
    print(f"{'metric':<14}" + "".join(f"{n:>14}" for n in names))
    print("-" * 70)
    for k in keys:
        row = f"{k:<14}"
        for n in names:
            row += f"{results[n]['metrics'][k]:>14.4f}"
        print(row)
    print("=" * 70)


def evaluate_signature_verifier(model_paths: Dict[str, str], test_data,
                                output_dir: str | Path,
                                batch_size: int = 128,
                                threshold: float = 0.5) -> Dict[str, Any]:
    """Full pipeline (reference :935-1058): load each model, score the seeded
    test pairs, plot, report."""
    out = Path(output_dir)
    results = {}
    for name, path in model_paths.items():
        snapshot = load_verifier(path)
        results[name] = evaluate_model(snapshot, test_data, batch_size,
                                       threshold)
        print(f"[{name}] acc {results[name]['metrics']['accuracy']:.4f} "
              f"EER {results[name]['metrics']['eer']:.4f}", flush=True)
    plot_roc(results, out / "roc.png")
    plot_det(results, out / "det.png")
    plot_score_distributions(results, out / "score_distributions.png")
    plot_metric_bars(results, out / "metric_comparison.png")
    report = generate_evaluation_report(results, out / "evaluation_report.json")
    print_comparison_table(results)
    return report
