"""Collect round-4 showcase-wave arm reports into one published artifact.

Each `scripts/showcase_wave_r4.py --arm=X` run writes
`/tmp/wave_r4_<arm>_s<seed>/wave_report.json`.  This gathers every report
found, sorts by worst-seed FID, and writes `docs/examples/wave_r4.json`
plus a markdown table to stdout for BASELINE.md.

Usage: python scripts/collect_wave_r4.py
"""
from __future__ import annotations

import glob
import json
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "docs" / "examples" / "wave_r4.json"


def main() -> None:
    # Merge with the already-published artifact: /tmp is per-host scratch,
    # so arms measured on an earlier host live only in docs/examples.
    by_key = {}
    if OUT.exists():
        for r in json.loads(OUT.read_text()).get("arms", []):
            by_key[(r["arm"], r.get("train_seed"))] = r
    for p in sorted(glob.glob("/tmp/wave_r4_*/wave_report.json")):
        with open(p) as f:
            r = json.load(f)
        key = (r["arm"], r.get("train_seed"))
        if key not in by_key or r.get("timestamp", "") >= \
                by_key[key].get("timestamp", ""):
            by_key[key] = r
    reports = list(by_key.values())
    if not reports:
        print("no wave reports found under /tmp/wave_r4_*/")
        return
    reports.sort(key=lambda r: r["fid_worst"])
    OUT.write_text(json.dumps({
        "wave": "round-4 showcase recipe wave (scripts/showcase_wave_r4.py)",
        "eval_protocol": "P2048 (round-3): 3 generation seeds x 2048 samples "
                         "vs 2048 real, random-init backbone",
        "arms": reports,
    }, indent=2))
    print(f"wrote {OUT} ({len(reports)} arms)\n")
    print("| arm | spec | FID mean±std | worst | worst/floor |")
    print("|---|---|---|---|---|")
    for r in reports:
        print(f"| {r['arm']} | {r['spec']} | {r['fid_mean']:.1f}±"
              f"{r['fid_std']:.1f} | {r['fid_worst']:.1f} | "
              f"{r['worst_x_floor']:.2f}x |")


if __name__ == "__main__":
    main()
