"""Quantitative scaling analysis: compiled-collective audit + analytic
communication account per shard mode (round-2 verdict item 3).

The BASELINE target is >=80% linear samples/s scaling from 1 chip to 2
hosts. Real multi-chip hardware is not available in this environment, so
the scaling claim rests on three checkable pieces instead of one
unlabeled shared-core curve:

1. **Compiled-collective audit** (`hlo_collectives`): lower the actual
   SPMD program for an n-device mesh and count the collective ops XLA
   emitted. Channel-parallel RX compiles to ZERO collectives — every
   stage partitions along the batch axis — so its scaling is linear by
   construction of the compiled program, not by assertion.
2. **Analytic communication account** (`collective_account`): bytes moved
   between devices per unit of work, from the shard geometry (halo sizes
   are static), against the per-shard compute volume.
3. **Predicted 2-host efficiency** (`predicted_efficiency`): measured
   single-chip throughput + the account above + stated link bandwidths.
"""

from __future__ import annotations

import re

import numpy as np

# stated link-bandwidth assumptions (bytes/s); sources: TPU v5e ICI
# ~400 GB/s/chip class, inter-host DCN 100 Gbps Ethernet class. The
# prediction function takes these as arguments so the assumption is
# explicit and overridable.
ICI_BYTES_PER_S = 400e9
DCN_BYTES_PER_S = 12.5e9


_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter|collective-broadcast)\b")


def hlo_collectives(jitted, *args) -> dict[str, int]:
    """Count collective ops in the compiled HLO of a jitted SPMD program."""
    hlo = jitted.lower(*args).compile().as_text()
    counts: dict[str, int] = {}
    for m in _COLLECTIVE_RE.finditer(hlo):
        # "-start" variants match the base name; dedupe start/done pairs by
        # counting starts only when present
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    # async collectives appear as op-start/op-done pairs in the text; halve
    # even counts of permutes conservatively? keep raw counts — callers
    # assert zero or compare relative volume, not exact op totals
    return counts


def collective_account(geom, active_nsymb: int | None = None,
                       n_local: int | None = None) -> dict:
    """Analytic inter-device communication per shard mode, from the static
    shard geometry (all sizes in bytes, f32 samples).

    - channel-parallel RX: each device owns whole capture buffers; no
      stage mixes rows -> 0 bytes between devices per buffer (the audit in
      tests/test_scale.py confirms the compiled program agrees).
    - time-sharded FIR: overlap-save halo of (taps-1) samples per shard
      per block, vs n_local samples of compute.
    - time-sharded RX: right halo of one frame + 2 symbols per shard per
      block, plus the seam-dedupe ppermute (one claim flag + one delay).
    """
    nsymb = active_nsymb if active_nsymb is not None else geom.nsymb
    frame_interp = geom.nofdm * (nsymb + geom.preamble_nsymb) * geom.interp
    if n_local is None:
        n_local = geom.nofdm * geom.buffer_nsymb * geom.interp
    buf_bytes = 4 * n_local
    halo_rx = 4 * (frame_interp + 2 * geom.nofdm * geom.interp)
    taps = int(np.asarray(geom.fir_rx_data).shape[0])
    return {
        "channel_parallel": {
            "bytes_per_buffer": 0,
            "compute_bytes_per_buffer": buf_bytes,
            "comm_fraction": 0.0,
        },
        "time_sharded_fir": {
            "halo_bytes_per_shard_block": 4 * (taps - 1),
            "compute_bytes_per_shard_block": buf_bytes,
            "comm_fraction": round(4 * (taps - 1) / buf_bytes, 5),
        },
        "time_sharded_rx": {
            "halo_bytes_per_shard_block": halo_rx + 8,   # + dedupe flags
            "compute_bytes_per_shard_block": buf_bytes,
            "comm_fraction": round((halo_rx + 8) / buf_bytes, 4),
        },
    }


def predicted_efficiency(measured_msamples_per_s: float, geom,
                         active_nsymb: int | None = None,
                         link_bytes_per_s: float = DCN_BYTES_PER_S,
                         overlap: bool = False) -> dict:
    """Predicted 1-chip -> multi-chip efficiency per shard mode at a stated
    link bandwidth, from the analytic account + a measured single-chip rate.

    Serialized model: eff = t_compute / (t_compute + t_comm); with
    double-buffered overlap, eff = min(1, t_compute / t_comm) clamped —
    reported separately so the conservative number is the headline.
    """
    acc = collective_account(geom, active_nsymb)
    n_local = geom.nofdm * geom.buffer_nsymb * geom.interp
    t_compute = n_local / (measured_msamples_per_s * 1e6)   # s per block
    out = {"assumed_link_bytes_per_s": link_bytes_per_s,
           "measured_msamples_per_s": measured_msamples_per_s}
    for mode, a in acc.items():
        comm_bytes = a.get("halo_bytes_per_shard_block",
                           a.get("bytes_per_buffer", 0))
        t_comm = comm_bytes / link_bytes_per_s
        eff_serial = t_compute / (t_compute + t_comm)
        eff_overlap = 1.0 if t_comm <= t_compute else t_compute / t_comm
        out[mode] = {
            "comm_bytes_per_block": comm_bytes,
            "efficiency_serialized": round(eff_serial, 4),
            "efficiency_overlapped": round(eff_overlap, 4),
        }
    return out
