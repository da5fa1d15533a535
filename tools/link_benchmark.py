#!/usr/bin/env python
"""ARQ link benchmark: effective throughput vs channel SNR.

The TPU-native equivalent of the reference's tools/mercury_benchmark.py
(sweep/adaptive sub-commands, measurement = delivered bytes over the
session window — SURVEY §4.3), but over the deterministic simulated channel
so a full sweep runs in minutes instead of hours of wall-clock audio.

  python tools/link_benchmark.py sweep --config 9 --snrs 5,10,15
  python tools/link_benchmark.py adaptive --snrs 0,10,20,30
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_session(init_cfg, snr_db, n_bytes, gear, robust, seed=0, max_sim_s=3600):
    from mercury_tpu.link import protocol as P
    from mercury_tpu.link.node import ArqConfig, ArqNode
    from mercury_tpu.link.sim import ChannelModel, LinkSimulator

    cfg = ArqConfig(init_configuration=init_cfg, gear_shift_on=gear,
                    robust_enabled=robust)
    cmd = ArqNode("VE3TPU", P.COMMANDER, cfg)
    rsp = ArqNode("N0CALL", P.RESPONDER, cfg)
    sim = LinkSimulator(cmd, rsp, ChannelModel(snr_db=snr_db, seed=seed))
    payload = bytes(np.random.default_rng(seed).integers(0, 256, n_bytes)
                    .astype(np.uint8))
    cmd.send_data(payload)
    cmd.connect("N0CALL")
    t = sim.run(max_sim_s=max_sim_s,
                until=lambda: len(rsp.fifo_rx) >= n_bytes)
    got = rsp.received()
    return {
        "snr_db": snr_db,
        "delivered": len(got),
        "intact": got == payload,
        "sim_seconds": round(t, 1),
        "bytes_per_min": round(len(got) * 60.0 / max(t, 1e-9), 1),
        "bps": round(len(got) * 8.0 / max(t, 1e-9), 1),
        "final_config": cmd.current_configuration,
        "breaks": cmd.stats.breaks_sent,
        "gearshift_ups": cmd.stats.gearshift_ups,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["sweep", "adaptive"])
    ap.add_argument("--config", type=int, default=0)
    ap.add_argument("--snrs", default="0,5,10,15,20,25,30")
    ap.add_argument("--bytes", type=int, default=2000)
    ap.add_argument("--robust", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    snrs = [float(s) for s in args.snrs.split(",")]
    gear = args.mode == "adaptive"
    results = []
    for snr in snrs:
        r = run_session(args.config, snr, args.bytes, gear, args.robust,
                        seed=int(snr * 10) & 0xFF)
        results.append(r)
        print(f"SNR {snr:+.0f} dB: {r['bytes_per_min']} B/min "
              f"({r['bps']} bps), final cfg {r['final_config']}, "
              f"{'OK' if r['intact'] else 'INCOMPLETE'} in {r['sim_seconds']}s")
    if args.out:
        json.dump(results, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
