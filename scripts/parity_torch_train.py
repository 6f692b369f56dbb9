"""Torch side of the quality-parity experiment (VERDICT r1 #3).

Trains the ACTUAL PyTorch reference pipeline (imported read-only from
/root/reference/src, executed in place — not copied) on CPU at a reduced
matched config, on the same synthetic dataset the JAX framework trains on.
Both runs are then scored with the same random-backbone FID + stroke stats +
LPIPS by scripts/parity_eval.py.

Matched recipe (both sides identical):
  64x64 grayscale, batch 64, z=100, Adam lr 2e-4 beta(0.5,0.999),
  label smoothing 0.9, n_critic 1, EPOCHS epochs, 1024 images
  (/tmp/parity_data, seed 0 synthetic set).

Reference entry points exercised: TrainingConfig + GANTrainer
(train_vanilla_gan_signatures.py:39,173), create_data_loader
(data_loader_signatures.py:249).
"""
from __future__ import annotations

import argparse
import pathlib
import sys

# torchvision is not installed in this environment; provide the minimal shim
# (scripts/torchvision_shim/) so the reference's own loader/visualizer run.
sys.path.insert(0, str(pathlib.Path(__file__).parent / "torchvision_shim"))
sys.path.insert(0, "/root/reference/src")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/parity_data")
    ap.add_argument("--out", default="/tmp/parity_torch")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()

    import torch
    torch.manual_seed(a.seed)

    from train_vanilla_gan_signatures import GANTrainer, TrainingConfig

    cfg = TrainingConfig(
        data_dir=a.data_dir,
        epochs=a.epochs,
        batch_size=64,
        num_workers=0,            # single-core host
        sample_interval=5,
        checkpoint_interval=5,
        checkpoint_dir=f"{a.out}/checkpoints",
        sample_dir=f"{a.out}/samples",
        log_dir=f"{a.out}/logs",
    )
    trainer = GANTrainer(cfg, device="cpu")
    trainer.train()
    print("torch parity training done", flush=True)


if __name__ == "__main__":
    main()
