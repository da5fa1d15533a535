"""Monte-Carlo BER/FER harness — the framework's primary correctness gate
(SURVEY §4: replicates the reference's PLOT_BASEBAND/PLOT_PASSBAND self-test,
telecom_system.cc:96-330, 2393-2480), batched: one receive() call evaluates an
entire batch of independent noisy frames per SNR point.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from mercury_tpu.channel import sim
from mercury_tpu.core.geometry import ModeGeometry, build_geometry
from mercury_tpu.modem.rx import RxChain
from mercury_tpu.modem.tx import TxChain


@dataclass
class BerPoint:
    esn0_db: float
    frames: int
    frame_errors: int
    bit_errors: int
    bits: int

    @property
    def fer(self) -> float:
        return self.frame_errors / max(self.frames, 1)

    @property
    def ber(self) -> float:
        return self.bit_errors / max(self.bits, 1)


@dataclass
class BerSweep:
    config: int
    points: list[BerPoint] = field(default_factory=list)

    def waterfall(self, fer_threshold: float = 0.1) -> float | None:
        """Lowest Es/N0 with FER below threshold."""
        ok = [p.esn0_db for p in self.points if p.fer < fer_threshold]
        return min(ok) if ok else None


class BerHarness:
    """Passband AWGN BER harness for one mode."""

    def __init__(self, config: int, batch: int = 32, seed: int = 0):
        self.geom = build_geometry(config)
        self.tx = TxChain(self.geom)
        self.rx = RxChain(self.geom)
        self.batch = batch
        self.seed = seed
        g = self.geom
        self.buf_len = g.nofdm * g.buffer_nsymb * g.interp
        # same delay structure as the reference harness
        # (telecom_system.cc:247-254,290); MFSK sync quantizes to symbol
        # boundaries so its frames are placed symbol-aligned
        if g.spec.is_mfsk:
            self.delay = (g.preamble_nsymb + 2) * g.nofdm * g.interp
        else:
            self.delay = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp

    def run_point(self, esn0_db: float, n_frames: int | None = None) -> BerPoint:
        g = self.geom
        n_frames = n_frames or self.batch
        rng = np.random.default_rng(self.seed + hash(esn0_db) % 65536)
        frame_errors = bit_errors = frames = 0
        payload_bits_per_frame = g.frame_bytes * 8
        key = jax.random.key(int(esn0_db * 1000) & 0x7FFFFFFF)

        while frames < n_frames:
            b = min(self.batch, n_frames - frames)
            payload = rng.integers(0, 256, (b, g.frame_bytes)).astype(np.uint8)
            tx_frames = self.tx.transmit(payload)
            if g.spec.is_mfsk:
                sigma = sim.sigma_for_channel_snr(
                    np.asarray(tx_frames[0]), esn0_db, g.fs, g.bandwidth)
            else:
                sigma = sim.sigma_for_esn0(esn0_db)
            key, sub = jax.random.split(key)
            buf = sim.awgn_passband(sub, tx_frames, sigma, self.delay, self.buf_len)
            res = self.rx.receive(buf)
            got = np.asarray(res.payload)
            errs = np.unpackbits(got ^ payload, axis=-1).sum(axis=-1)
            frame_errors += int((errs > 0).sum())
            bit_errors += int(errs.sum())
            frames += b
        return BerPoint(esn0_db, frames, frame_errors, bit_errors,
                        frames * payload_bits_per_frame)

    def sweep(self, esn0_list, n_frames: int | None = None,
              early_exit_fer: float = 0.0, verbose: bool = False) -> BerSweep:
        """Sweep descending-difficulty points; optional early exit once FER
        reaches `early_exit_fer` (the reference's waterfall early-exit)."""
        out = BerSweep(self.geom.spec.config)
        for e in esn0_list:
            p = self.run_point(e, n_frames)
            out.points.append(p)
            if verbose:
                print(f"cfg{out.config} Es/N0={e:+.1f} dB: FER={p.fer:.3f} "
                      f"BER={p.ber:.5f}")
            if p.fer <= early_exit_fer:
                break
        return out
