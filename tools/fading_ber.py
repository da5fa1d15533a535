#!/usr/bin/env python
"""FER under the Watterson HF fading channel (CCIR 520 presets).

The reference's Monte-Carlo harness is AWGN-only (awgn.cc); real HF paths
fade. This sweeps channel SNR for a ladder cross-section under
good/moderate/poor Watterson conditions (channel/sim.py watterson — two
Rayleigh paths, Gaussian Doppler) and writes docs/fading_r2.json. Fading is
synthesized on the host (trivial next to the demod); decode runs batched on
the accelerator.

Usage: python tools/fading_ber.py [--frames 256] [--configs 0 4 9 100]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SNR_GRID = {                       # channel SNR (dB) points per config
    0: (-6, -3, 0, 3, 6),
    4: (0, 3, 6, 9, 12),
    9: (6, 9, 12, 15, 18),
    100: (-12, -9, -6, -3, 0),
}


def run_config(cfg: int, preset: str, frames: int, batch: int,
               profile: str = "static") -> list[dict]:
    """profile: "static" = the default receiver (frame-wide pilot LS);
    "track" = the fading profile — time-localized pilot LS window (5, 21)
    bootstrapping a decision-directed re-estimation with a (5, 9) window,
    2 passes. Tracking follows fading inside a frame (the thing the
    reference's estimator cannot do); it lifts the OFDM moderate-preset
    floor by ~50x at the cost of some AWGN sensitivity, so it's a knob,
    not the default. MFSK modes are noncoherent — profile is ignored."""
    import jax
    import jax.numpy as jnp

    from mercury_tpu.channel import sim
    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.modem.rx import RxChain
    from mercury_tpu.modem.tx import TxChain

    if profile == "track" and not build_geometry(cfg).spec.is_mfsk:
        g = build_geometry(cfg, ls_window=(5, 21))
        tx = TxChain(g)
        rx = RxChain(g, dd=True, dd_window=(5, 9), dd_passes=2)
    else:
        g = build_geometry(cfg)
        tx, rx = TxChain(g), RxChain(g)
    buf_len = g.nofdm * g.buffer_nsymb * g.interp
    delay = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp
    pts = []
    for snr in SNR_GRID[cfg]:
        errs = tot = 0
        rng = np.random.default_rng(100000 + 1000 * cfg + int(snr) * 7)
        rounds = max(1, frames // batch)
        for r in range(rounds):
            payload = rng.integers(0, 256, (batch, g.frame_bytes)).astype(np.uint8)
            pb = np.asarray(tx.transmit(payload), np.float64)
            faded = sim.watterson(pb, fs=g.fs, seed=int(rng.integers(1 << 30)),
                                  **sim.WATTERSON_PRESETS[preset])
            sigma = sim.sigma_for_channel_snr(pb[0], float(snr), g.fs,
                                              g.bandwidth)
            buf = sim.awgn_passband(jax.random.key(r + 17), jnp.asarray(
                faded, jnp.float32), sigma, delay, buf_len)
            res = rx.receive(jnp.asarray(buf, jnp.float32))
            ok = np.asarray(res.crc_ok)
            good = ok & (np.asarray(res.payload) == payload).all(axis=-1)
            errs += int((~good).sum())
            tot += batch
        pts.append({"snr_db": float(snr), "fer": round(errs / tot, 4),
                    "frames": tot})
        print(f"  cfg{cfg} {preset} {snr:+.0f} dB: FER {errs/tot:.3f}",
              file=sys.stderr, flush=True)
    return pts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--configs", type=int, nargs="*",
                    default=[0, 4, 9, 100])
    ap.add_argument("--presets", nargs="*",
                    default=["good", "moderate", "poor"])
    ap.add_argument("--profile", default="static",
                    choices=["static", "track"],
                    help="receiver profile: static (default chain) or track "
                    "(time-localized LS + decision-directed re-estimation)")
    ap.add_argument("--out", default=None,
                    help="output JSON (default docs/fading_r2.json, or "
                    "docs/fading_track_r2.json with --profile track)")
    args = ap.parse_args()

    import jax
    out = {"meta": {"platform": jax.devices()[0].platform,
                    "frames_per_point": args.frames,
                    "profile": args.profile,
                    "model": "Watterson 2-path Rayleigh, CCIR 520 presets"},
           "results": []}
    for cfg in args.configs:
        for preset in args.presets:
            pts = run_config(cfg, preset, args.frames, args.batch,
                             args.profile)
            out["results"].append({"config": cfg, "preset": preset,
                                   "points": pts})
    name = args.out or ("fading_track_r2.json" if args.profile == "track"
                        else "fading_r2.json")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
