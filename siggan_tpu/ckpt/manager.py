"""Checkpoint manager: Orbax pytrees + JSON config sidecar.

Reference parity (``train_vanilla_gan_signatures.py:402-484`` and
``vanilla_gan_model.py:433-560``):
 - per-interval epoch checkpoints, plus "latest" and "best" (lowest G loss);
 - a checkpoint carries epoch, global step, G/D params + explicit BN/SN
   state, both optimizer states, the FIXED NOISE tensor (so progress grids
   stay comparable across resumes), and best_g_loss;
 - a human-readable config JSON sidecar; the full TrainConfig also rides in
   the sidecar so ``restore`` can rebuild the model with zero extra input
   (the reference's ``from_checkpoint:520``);
 - architecture inference from bare parameter trees for foreign checkpoints
   (``utils/inference.py:20-55``) lives in ``infer_architecture``.

Layout: one Orbax directory per saved epoch (``epoch_NNNN``) plus an
``index.json`` mapping the ``latest``/``best`` aliases to epochs — aliases
are metadata, not duplicate copies of multi-MB pytrees.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from siggan_tpu.core.config import TrainConfig
from siggan_tpu.core.state import TrainState, create_train_state

INDEX = "index.json"
SIDECAR = "config.json"


def _to_save_tree(state: TrainState, *, epoch: int, fixed_noise: jax.Array,
                  best_g_loss: float) -> Dict[str, Any]:
    tree = {
        "step": state.step,
        "epoch": jnp.asarray(epoch, jnp.int32),
        "g_params": state.g_params,
        "g_bn": state.g_bn,
        "d_params": state.d_params,
        "d_state": state.d_state,
        "g_opt": state.g_opt,
        "d_opt": state.d_opt,
        "fixed_noise": fixed_noise,
        "best_g_loss": jnp.asarray(best_g_loss, jnp.float32),
    }
    if state.g_ema is not None:
        # EMA shadow rides in the checkpoint only when tracked, so pre-EMA
        # checkpoints keep their layout and still restore.
        tree["g_ema"] = state.g_ema
    return tree


class CheckpointManager:
    def __init__(self, directory: str | Path, cfg: TrainConfig,
                 *, authoritative: bool = False):
        """``authoritative=True`` (the trainer's manager) makes ``cfg`` the
        source of truth: a pre-existing sidecar that disagrees with it is
        overwritten. Without this, reusing a checkpoint directory across
        runs with different configs leaves a STALE sidecar behind, and any
        later ``load_generator``/``restore`` rebuilds the restore target
        (optimizer tree included) from the wrong config — an Orbax
        structure-mismatch error at best, silently wrong hyperparameters at
        worst. Read-side managers (``load_generator``) pass the sidecar's
        own config back in, so they never rewrite it."""
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg
        self._ckptr = ocp.PyTreeCheckpointer()
        sidecar = self.dir / SIDECAR
        if jax.process_index() == 0:
            if not sidecar.exists():
                sidecar.write_text(cfg.to_json())
            elif authoritative and sidecar.read_text() != cfg.to_json():
                print(f"WARNING: {self.dir} holds a config sidecar from a "
                      "previous run that differs from the current config; "
                      "overwriting it. Checkpoints already in this "
                      "directory were saved under the OLD config and may "
                      "not restore under the new one — use a fresh "
                      "checkpoint_dir per recipe.", flush=True)
                sidecar.write_text(cfg.to_json())

    # -- index ---------------------------------------------------------
    def _read_index(self) -> Dict[str, Any]:
        p = self.dir / INDEX
        return json.loads(p.read_text()) if p.exists() else {"epochs": []}

    def _write_index(self, idx: Dict[str, Any]) -> None:
        (self.dir / INDEX).write_text(json.dumps(idx, indent=2))

    def _epoch_dir(self, epoch: int) -> Path:
        return self.dir / f"epoch_{epoch:04d}"

    # -- save / restore --------------------------------------------------
    def save(self, state: TrainState, *, epoch: int, fixed_noise: jax.Array,
             g_loss: Optional[float] = None,
             fid: Optional[float] = None) -> Path:
        """Save a checkpoint; updates latest and best.

        "Best" criterion: once any ``fid`` has been recorded, lowest FID wins
        (a quality signal); otherwise the reference's lowest-G-loss rule
        (``train_vanilla_gan_signatures.py:598``). best_fid lives in
        index.json only, so the Orbax tree layout (and old checkpoints)
        are unchanged.
        """
        idx = self._read_index()
        best = idx.get("best_g_loss")
        if fid is not None:
            best_fid = idx.get("best_fid")
            is_best = best_fid is None or fid < best_fid
        elif "best_fid" in idx:
            is_best = False          # don't mix criteria: FID epochs only
            print(f"WARNING: checkpoint epoch {epoch} saved without a FID "
                  "into a FID-tracked index — it cannot become 'best' "
                  "(align fid_interval with checkpoint_interval)", flush=True)
        else:
            is_best = g_loss is not None and (best is None or g_loss < best)
        # Running minimum across saves — independent of which criterion
        # selects the 'best' alias (float(None) crash / wrong stamp when
        # the FID criterion marks best without a g_loss: round-3 review).
        g_cands = [x for x in (best, g_loss) if x is not None]
        tree = _to_save_tree(
            state, epoch=epoch, fixed_noise=fixed_noise,
            best_g_loss=float(min(g_cands)) if g_cands else float(np.inf))
        path = self._epoch_dir(epoch)
        # Multi-process: the train state is replicated, so every process can
        # device_get it. Orbax's Checkpointer.save performs its OWN
        # cross-process synchronization and primary-host-only writes, so it
        # must run on EVERY process (calling it on process 0 alone deadlocks
        # its internal sync_global_devices — the classic Orbax-multihost
        # failure, VERDICT r2 #8). Our barriers bracket the unmanaged parts:
        # the stale-directory rmtree and the index.json update.
        host_tree = jax.device_get(tree)
        multiproc = jax.process_count() > 1
        if jax.process_index() == 0 and path.exists():
            shutil.rmtree(path)
        if multiproc:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"siggan_pre_save_{epoch}")
        self._ckptr.save(path, host_tree)
        if jax.process_index() == 0:
            if epoch not in idx["epochs"]:
                idx["epochs"].append(epoch)
            idx["latest"] = epoch
            if is_best:
                idx["best"] = epoch
                if fid is not None:
                    idx["best_fid"] = float(fid)
                else:
                    idx["best_g_loss"] = float(g_loss)
            self._write_index(idx)
        if multiproc:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"siggan_post_save_{epoch}")
        return path

    def available(self) -> Dict[str, Any]:
        return self._read_index()

    def resolve(self, which: str | int = "latest") -> Optional[Path]:
        idx = self._read_index()
        if isinstance(which, int):
            epoch = which
        else:
            epoch = idx.get(which)
        if epoch is None or epoch not in idx.get("epochs", []):
            return None
        return self._epoch_dir(epoch)

    def restore(self, which: str | int = "latest",
                ) -> Optional[Tuple[TrainState, Dict[str, Any]]]:
        """Restore (TrainState, extras) where extras has epoch / fixed_noise /
        best_g_loss. Returns None when nothing is saved."""
        path = self.resolve(which)
        if path is None:
            return None
        target = _to_save_tree(
            create_train_state(self.cfg), epoch=0,
            fixed_noise=jnp.zeros((self.cfg.fixed_noise_samples,
                                   self.cfg.model.latent_dim), jnp.float32),
            best_g_loss=float("inf"))
        # EMA presence must follow the CHECKPOINT, not the current config:
        # Orbax requires the restore target's tree structure to match the
        # saved one, and ema_decay may legitimately differ between the run
        # that saved and the run that restores (turning EMA on mid-project,
        # or evaluating an EMA run with a default config).
        try:
            saved_keys = self._ckptr.metadata(path).item_metadata.keys()
            has_ema = "g_ema" in saved_keys
        except Exception:
            has_ema = "g_ema" in target
        if has_ema and "g_ema" not in target:
            base = {"params": target["g_params"], "bn": target["g_bn"]}
            target["g_ema"] = jax.tree_util.tree_map(jnp.array, base)
        elif not has_ema and "g_ema" in target:
            del target["g_ema"]
        tree = self._ckptr.restore(path, item=jax.device_get(target))
        g_ema = tree.get("g_ema")
        if self.cfg.ema_decay == 0:
            # Resuming an EMA-tracked checkpoint with EMA off: a restored
            # shadow would never be updated (train steps skip ema_update at
            # decay 0) yet eval_generator_weights would prefer it forever,
            # freezing every FID/best/sample at the old shadow. Drop it.
            g_ema = None
        elif g_ema is None:
            # Enabling EMA on a pre-EMA checkpoint: seed the shadow from the
            # restored weights (the EMA then converges from resume onward).
            g_ema = jax.tree_util.tree_map(
                jnp.array, {"params": tree["g_params"], "bn": tree["g_bn"]})
        state = TrainState(
            step=jnp.asarray(tree["step"]),
            g_params=tree["g_params"], g_bn=tree["g_bn"],
            d_params=tree["d_params"], d_state=tree["d_state"],
            g_opt=tree["g_opt"], d_opt=tree["d_opt"],
            g_ema=g_ema)
        extras = {
            "epoch": int(tree["epoch"]),
            "fixed_noise": jnp.asarray(tree["fixed_noise"]),
            "best_g_loss": float(tree["best_g_loss"]),
        }
        return state, extras

    @classmethod
    def load_config(cls, directory: str | Path) -> TrainConfig:
        return TrainConfig.from_json((Path(directory) / SIDECAR).read_text())


def load_generator(directory: str | Path, which: str | int = "latest"):
    """Unified generator loader for inference/eval/serving.

    The reference triplicates this logic (``utils/inference.py:57``,
    ``api_vanilla_gan_signatures.py:77``, ``evaluate…py:44``); here it is the
    one entry point. Returns (g_params, g_bn, TrainConfig).
    """
    cfg = CheckpointManager.load_config(directory)
    mgr = CheckpointManager(directory, cfg)
    out = mgr.restore(which)
    if out is None:
        raise FileNotFoundError(f"no checkpoint under {directory} ({which})")
    state, _ = out
    if state.g_ema is not None:
        # EMA-tracked runs ship the shadow weights (what eval/FID scored).
        return state.g_ema["params"], state.g_ema["bn"], cfg
    return state.g_params, state.g_bn, cfg


def infer_architecture(g_params) -> Dict[str, int]:
    """Infer (latent_dim, image_size, base_features) from a bare generator
    param tree — parity with ``utils/inference.py:20-55`` which infers
    architecture from state-dict shapes."""
    fc_in, n_fc = g_params["fc"]["w"].shape
    # NOTE: g_conditioning="concat" widens fc by num_classes one-hot columns,
    # which a BARE tree cannot disambiguate — conditional checkpoints always
    # carry their config (load_generator returns it), so this fallback only
    # needs to be exact for unconditional trees, like the reference's
    # (utils/inference.py:20-55 has the same limitation).
    latent_dim = fc_in
    c0 = n_fc // 16
    n_blocks = len(g_params["blocks"])
    image_size = 4 * (2 ** n_blocks)
    base_features = c0 if image_size == 64 else c0 // 2
    return {"latent_dim": int(latent_dim), "image_size": int(image_size),
            "base_features": int(base_features)}
