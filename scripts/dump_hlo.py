"""Dump the optimized HLO of the fused train step (bench config) and print
an index of fusion name -> root op shape/metadata, for mapping xprof
hlo_stats rows back to source ops.

Usage: python scripts/dump_hlo.py [out.txt] [K]
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import numpy as np

    from siggan_tpu.core.config import TrainConfig
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_resident_multi_step

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = TrainConfig()
    state = create_train_state(cfg)
    rs = np.random.RandomState(0)
    images = jax.numpy.asarray(
        (rs.rand(2048, 64, 64, 1) * 2 - 1).astype(np.float32))
    step_fn, _ = make_resident_multi_step(cfg, images.shape[0], K)
    step = jax.jit(step_fn, donate_argnums=(0,))
    compiled = step.lower(state, images).compile()
    txt = compiled.as_text()
    Path(out).write_text(txt)
    print(f"wrote {len(txt)} bytes to {out}")

    # Index: for each fusion computation, find convs/dots inside and their
    # shapes + op_name metadata (source line info).
    fusions = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^%?(\S*fusion[^ ]*)\s*\(", line.strip())
        if line.startswith("%") or line.startswith("ENTRY"):
            mm = re.match(r"^%(\S+)\s*\(", line)
            cur = mm.group(1) if mm else None
            continue
        if cur is None:
            continue
        if ("convolution(" in line or " dot(" in line or "convolution"
                in line.split("=")[0] if "=" in line else False):
            pass
        if "convolution" in line or re.search(r"= \S+ dot\(", line):
            meta = re.search(r'op_name="([^"]*)"', line)
            shp = re.match(r"\s*%?\S+ = (\S+)", line)
            fusions.setdefault(cur, []).append(
                (shp.group(1) if shp else "?", meta.group(1) if meta else ""))
    for name, ops in fusions.items():
        for shp, meta in ops:
            print(f"{name}\t{shp}\t{meta[:200]}")


if __name__ == "__main__":
    main()
