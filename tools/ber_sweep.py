#!/usr/bin/env python
"""Run BER/FER sweeps across the mode ladder and write results to JSON.

Usage: python tools/ber_sweep.py [out.json] [--configs 0,1,...] [--frames N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="ber_results.json")
    ap.add_argument("--configs", default=None)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mercury_tpu.channel.ber import BerHarness

    # sweep grids centred on each mode's measured operating region
    grids = {
        0: [0, 1, 2, 3, 4], 1: [1, 2, 3, 4, 5], 2: [2, 3, 4, 5, 6],
        3: [3, 4, 5, 6, 7], 4: [4, 5, 6, 7, 8], 5: [4, 5, 6, 7, 8],
        6: [5, 6, 7, 8, 9], 7: [6, 7, 8, 9, 10], 8: [7, 8, 9, 10, 11],
        9: [8, 9, 10, 11, 12], 10: [10, 11, 12, 13, 14], 11: [11, 12, 13, 14, 15],
        12: [13, 14, 15, 16, 17], 13: [14, 15, 16, 17, 18],
        14: [16, 17, 18, 19, 20], 15: [22, 24, 26, 28], 16: [26, 28, 30, 32],
        100: [-16, -15, -14, -13, -12], 101: [-14, -13, -12, -11, -10],
        102: [-11, -10, -9, -8, -7],
    }
    configs = ([int(c) for c in args.configs.split(",")] if args.configs
               else list(grids))

    results = {}
    for cfg in configs:
        h = BerHarness(cfg, batch=args.batch)
        sweep = h.sweep(sorted(grids[cfg], reverse=True), n_frames=args.frames,
                        verbose=True)
        results[str(cfg)] = {
            "points": [{"esn0_db": p.esn0_db, "fer": p.fer, "ber": p.ber,
                        "frames": p.frames} for p in sweep.points],
            "waterfall_fer10": sweep.waterfall(0.1),
        }
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"cfg{cfg}: waterfall(FER<0.1) = {sweep.waterfall(0.1)}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
