"""Capture a jax.profiler trace of the fused train step and dump the top
HLO ops by self-time (via xprof's hlo_stats converter).

Usage: python scripts/trace_step.py [trace_dir] [--image-size=128]
       [--batch=64] [--sn] [--k=512]
"""
from __future__ import annotations

import glob
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def capture(trace_dir: str, image_size: int = 64, batch: int = 64,
            sn: bool = False, k: int = 512) -> None:
    import jax
    import numpy as np

    from siggan_tpu.core.config import ModelConfig, TrainConfig
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_resident_multi_step

    cfg = TrainConfig(
        model=ModelConfig(image_size=image_size, use_spectral_norm=sn),
        batch_size=batch)
    state = create_train_state(cfg)
    rs = np.random.RandomState(0)
    images = jax.numpy.asarray(
        (rs.rand(2048, image_size, image_size, 1) * 2 - 1).astype(np.float32))
    K = k  # bench.py uses 512 at 64px
    step_fn, _ = make_resident_multi_step(cfg, images.shape[0], K)
    step = jax.jit(step_fn, donate_argnums=(0,))
    state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)


def report(trace_dir: str, top: int = 40) -> None:
    from xprof.convert import raw_to_tool_data

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # gviz table: {cols: [...], rows: [{c: [{v: ...}...]}]}
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]

    def col(name_part):
        for i, c in enumerate(cols):
            if name_part.lower() in str(c).lower():
                return i
        raise KeyError(f"{name_part} not in {cols}")

    i_cat = col("category")
    # find the expression/name column explicitly; "HLO" alone can match the
    # category column depending on xprof version
    i_expr = None
    for want in ("expression", "hlo op name", "hlo name", "program"):
        try:
            c = col(want)
            if c != i_cat:
                i_expr = c
                break
        except KeyError:
            continue
    if i_expr is None:
        print(f"columns: {cols}")
        i_expr = col("HLO")
    i_self = col("Total self time (us)")
    rows = []
    for r in obj["rows"]:
        v = r["c"]
        rows.append((float(v[i_self]["v"] or 0), v[i_cat]["v"],
                     str(v[i_expr]["v"])[:160]))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"total self time: {total:.0f} us over {len(rows)} ops")
    bycat = {}
    for t, cat, _ in rows:
        bycat[cat] = bycat.get(cat, 0.0) + t
    for cat, t in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:40s} {t:9.0f} us  {100*t/total:5.1f}%")
    print("\ntop ops:")
    for t, cat, expr in rows[:top]:
        print(f"{t:9.0f} us  {100*t/total:5.1f}%  [{cat}] {expr}")


if __name__ == "__main__":
    size, batch, sn, k = 64, 64, False, 512
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--image-size="):
            size = int(a.split("=", 1)[1])
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a == "--sn":
            sn = True
        elif a != "--report-only":
            args.append(a)
    d = args[0] if args else "/tmp/trace_step"
    if "--report-only" not in sys.argv:
        capture(d, image_size=size, batch=batch, sn=sn, k=k)
    report(d)
