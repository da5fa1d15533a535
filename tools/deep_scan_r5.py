#!/usr/bin/env python
"""Deep-sync acquisition: round-5 redesign measurements (VERDICT r4 item 6).

The round-5 coherent arbitration (acq_floor_r5) initially cost ~220 ms/call
of real device time at batch 256 — per-candidate segment gathers lower to
ELEMENT-rate TPU gathers (~1-2 ms per candidate, the LDPC lesson). The
redesign measured here:

  cfg0 (the acquisition-limited mode): ONE coherent whole-buffer scan
    through the fused VMEM kernel (bank [61, 1, Lp*S_d], max-reduced over
    the CFO axis IN-kernel — pallas deep_mf_max), pooled top-32
    nomination, pilot arbitration via the fused pilot_cand_score kernel,
    CRC-gated runner-up rescue.
  cfg1-4: the round-4 argmax chain (their r4 campaign already measured
    passband == baseband — docs/ber_r4b.json), with the noncoherent scan
    kernel's transforms in bf16 (the kernel sits at the f32 MXU bound).

Protocol: in-graph lax.fori_loop amortization ((t_K - t_1)/(K-1), one
dispatch per measurement) — immune to relay-latency swings that made
per-call dispatch timing junk (observed 23 -> 278 ms for identical
programs minutes apart); a cfg9 health probe is still recorded for
context. FER validation runs at each config's round-4 effective waterfall
(FER is count-based, relay-immune).

    python tools/deep_scan_r5.py [--skip-fer] [--out docs/deep_scan_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 256
# round-4 effective waterfalls (docs/ber_r4b.json) and front-end delta -5
R4_EFF_WF = {0: -9.75, 1: -7.5, 2: -6.0, 3: -4.75, 4: -3.75}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/deep_scan_r5.json")
    ap.add_argument("--fer-frames", type=int, default=512)
    ap.add_argument("--skip-fer", action="store_true")
    ap.add_argument("--skip-tp", action="store_true")
    ap.add_argument("--budget", type=float, default=9000.0)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform

    import jax.numpy as jnp
    import numpy as np

    from mercury_tpu.channel import sim
    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.modem.rx import RxChain
    from mercury_tpu.modem.tx import TxChain

    t_start = time.time()

    def left() -> float:
        return args.budget - (time.time() - t_start)

    def make(cfg, **kw):
        g = build_geometry(cfg)
        tx, rx = TxChain(g), RxChain(g, **kw)
        rng = np.random.default_rng(0)
        p = rng.integers(0, 256, (B, g.frame_bytes)).astype(np.uint8)
        fr = tx.transmit(p)
        bl = g.nofdm * g.buffer_nsymb * g.interp
        d = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp
        buf = jnp.asarray(sim.awgn_passband(
            jax.random.key(1), fr, sim.sigma_for_esn0(30.0), d, bl),
            jnp.float32)
        return g, rx, buf, bl

    def amortized_ms(g, rx, buf, k=6):
        def body(i, acc):
            r = rx.receive_fn(buf + (i.astype(jnp.float32)
                                     * jnp.float32(1e-7)))
            return acc + r.payload.astype(jnp.int32)

        z = jnp.zeros((B, g.frame_bytes), jnp.int32)

        def runk(kk):
            f = jax.jit(lambda b_: jax.lax.fori_loop(0, kk, body, z))
            np.asarray(f(buf))
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(f(buf))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, tk = runk(1), runk(k)
        return (tk - t1) / (k - 1) * 1e3, t1 * 1e3

    out = {"meta": {"platform": platform, "batch": B,
                    "protocol": "in-graph fori amortization (t_K-t_1)/"
                                "(K-1), one dispatch per point"},
           "throughput": [], "fer": []}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)

    def save():
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, args.out)

    if not args.skip_tp:
        # health context row (per-call dispatch, NOT used for the table)
        g9, rx9, buf9, _ = make(9)
        ms9, t1_9 = amortized_ms(g9, rx9, buf9)
        out["meta"]["cfg9_amortized_ms"] = round(ms9, 2)
        print(f"cfg9: {ms9:.2f} ms/call amortized", flush=True)

        done = {(r["config"], r["variant"]) for r in out["throughput"]}
        jobs = [(0, "coherent(default)", {}),
                (1, "argmax+bf16(default)", {}),
                (2, "argmax+bf16(default)", {}),
                (3, "argmax+bf16(default)", {}),
                (4, "argmax+bf16(default)", {}),
                (3, "argmax+f32", {"_attrs": {"_deep_scan_bf16": False}}),
                (0, "r4-chain", {"deep_coherent": False,
                                 "_attrs": {"_deep_scan_bf16": False}})]
        for cfg, variant, kw in jobs:
            if (cfg, variant) in done or left() < 600:
                continue
            attrs = dict(kw.pop("_attrs", {}))
            g, rx, buf, bl = make(cfg, **kw)
            for k2, v in attrs.items():
                setattr(rx, k2, v)
            ms, t1 = amortized_ms(g, rx, buf)
            row = {"config": cfg, "variant": variant,
                   "ms_per_call": round(ms, 3),
                   "msamples_per_s": round(B * bl / ms / 1e3, 1),
                   "single_dispatch_ms": round(t1, 1)}
            out["throughput"].append(row)
            print(f"cfg{cfg} {variant}: {ms:.2f} ms/call = "
                  f"{row['msamples_per_s']} Ms/s", flush=True)
            save()

    if not args.skip_fer:
        from mercury_tpu.channel.ber import BerHarness

        done_fer = {(r["config"], r["eff_esn0"]) for r in out["fer"]}
        for cfg, eff in R4_EFF_WF.items():
            if (cfg, eff) in done_fer or left() < 400:
                continue
            h = BerHarness(cfg, batch=256)
            delta = h.front_end_delta()
            p = h.run_point(eff - delta, args.fer_frames)
            row = {"config": cfg, "eff_esn0": eff, "fer": round(p.fer, 4),
                   "frames": p.frames, "r4_criterion": "FER<0.1 at the "
                   "round-4 effective waterfall"}
            out["fer"].append(row)
            print(f"FER cfg{cfg} @ eff {eff:+.2f}: {p.fer:.4f} "
                  f"({p.frames} fr)", flush=True)
            save()
            del h

    save()
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
