#!/usr/bin/env python
"""Reference-build baseband waterfall oracle.

Runs the reference's OWN baseband Monte-Carlo harness (via
tools/golden_gen berbb == baseband_test_EsN0) at ascending Es/N0 until
FER < 0.1, for every OFDM config. Produces docs/ref_oracle_bb.json — the
per-config evidence of where the CURRENT reference build actually
waterfalls vs its documented table (common_defines.h:129-148).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

DOCUMENTED = {0: -10.0, 1: -7.5, 2: -6.0, 3: -4.5, 4: -3.5, 5: -2.5,
              6: -1.5, 7: -0.5, 8: 0.5, 9: 1.5, 10: 3.0, 11: 4.0,
              12: 6.5, 13: 7.5, 14: 9.0, 15: 12.5, 16: 13.5}

HERE = os.path.dirname(os.path.abspath(__file__))
BIN = os.path.join(HERE, "golden_gen", "build", "golden_gen")
OUT = os.path.join(os.path.dirname(HERE), "docs", "ref_oracle_bb.json")


def run_point(cfg: int, esn0: float, frames: int) -> dict:
    p = subprocess.run([BIN, "berbb", str(cfg), str(esn0), str(frames)],
                       capture_output=True, text=True, timeout=3600)
    m = re.search(r"BERBB_RESULT cfg=\d+ esn0=([-\d.]+) frames=(\d+) "
                  r"ferrors=(\d+) fer=([\d.]+) ber=([\d.]+)", p.stdout)
    if not m:
        raise RuntimeError(f"no result for cfg{cfg} @ {esn0}: {p.stdout[-300:]}")
    return {"esn0": float(m.group(1)), "frames": int(m.group(2)),
            "ferrors": int(m.group(3)), "fer": float(m.group(4)),
            "ber": float(m.group(5))}


def main() -> int:
    results = {"results": []}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    done = {r["config"] for r in results["results"]}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)

    cfgs = [int(a) for a in sys.argv[1:]] or list(range(17))
    for cfg in cfgs:
        if cfg in done:
            continue
        doc = DOCUMENTED[cfg]
        points = []
        wf = None
        e = doc - 1.0
        while e <= doc + 22.0:
            frames = 400
            pt = run_point(cfg, e, frames)
            points.append(pt)
            print(f"ref cfg{cfg} @ {e:+.1f}: FER={pt['fer']:.3f}", flush=True)
            if pt["fer"] < 0.1:
                wf = e
                break
            # coarse steps while failure is total, fine near the knee
            e += 1.0 if pt["fer"] > 0.6 else 0.5
        results["results"].append({
            "config": cfg, "documented_db": doc, "waterfall_fer10": wf,
            "gap_vs_documented_db": None if wf is None else round(wf - doc, 2),
            "points": points})
        tmp = OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, OUT)
        print(f"ref cfg{cfg}: waterfall {wf} (doc {doc})", flush=True)
    print("oracle scan complete", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
