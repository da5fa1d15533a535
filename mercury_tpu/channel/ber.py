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
            # fill="signal": the reference pads the pre-delay region with
            # random signal samples (awgn.cc apply_with_delay), stressing
            # false sync locks — match it so waterfall numbers are comparable
            buf = sim.awgn_passband(sub, tx_frames, sigma, self.delay,
                                    self.buf_len, fill="signal")
            res = self.rx.receive(buf)
            got = np.asarray(res.payload)
            errs = np.unpackbits(got ^ payload, axis=-1).sum(axis=-1)
            frame_errors += int((errs > 0).sum())
            bit_errors += int(errs.sum())
            frames += b
        return BerPoint(esn0_db, frames, frame_errors, bit_errors,
                        frames * payload_bits_per_frame)

    def run_point_baseband(self, esn0_db: float,
                           n_frames: int | None = None) -> BerPoint:
        """Baseband Monte-Carlo (reference: baseband_test_EsN0,
        telecom_system.cc:96-229): no preamble/sync/mixers/CRC/dispersal —
        complex AWGN applied at the OFDM symbol level with the 1/sqrt(Nfft)
        power normalization; isolates FEC + estimation + demapping."""
        import jax.numpy as jnp

        from mercury_tpu.dsp import ops
        from mercury_tpu.fec import ldpc
        from mercury_tpu.modem import psk

        g = self.geom
        if g.spec.is_mfsk:
            raise ValueError("baseband harness is OFDM-only (reference parity)")
        tx, rx = self.tx, self.rx
        code = tx.code
        n_frames = n_frames or self.batch
        rng = np.random.default_rng(self.seed + 17)
        sigma = 10 ** (-esn0_db / 20.0)
        norm = np.sqrt(g.nfft)
        frame_errors = bit_errors = frames = 0
        n_real = g.n_bits - g.ldpc_p
        key = jax.random.key(int(esn0_db * 977) & 0x7FFFFFFF)

        while frames < n_frames:
            b = min(self.batch, n_frames - frames)
            bits = rng.integers(0, 2, (b, n_real))
            u = np.concatenate([bits, bits[:, : g.n_virtual]], axis=-1)
            cw = ldpc.encode(code, jnp.asarray(u))
            tx_bits = jnp.concatenate(
                [jnp.asarray(bits), cw[:, code.k:]], axis=-1)
            inter = jnp.take(tx_bits, jnp.asarray(g.bit_perm), axis=-1)
            syms = psk.mod(inter, tx._const)
            syms = jnp.take(syms, jnp.asarray(g.tf_perm), axis=-1)
            flat = jnp.zeros((b, g.nsymb * g.nc), dtype=tx.cdtype)
            flat = flat.at[:, jnp.asarray(g.data_cells)].set(syms)
            flat = flat.at[:, jnp.asarray(g.pilot_cells)].set(
                jnp.asarray(g.pilot_seq.astype(np.complex64))[None])
            grid = flat.reshape(b, g.nsymb, g.nc)
            td = ops.ofdm_mod(grid, jnp.asarray(g.pad_map), g.nfft, g.ngi) / norm
            key, sub = jax.random.split(key)
            noise = (sigma / np.sqrt(2)) * (
                jax.random.normal(sub, td.shape) +
                1j * jax.random.normal(jax.random.fold_in(sub, 1), td.shape))
            rx_td = (td + noise) * norm
            rx_grid = ops.ofdm_demod(rx_td, jnp.asarray(g.pad_map), g.nfft, g.ngi)
            llr, _snr, _mh, _d = rx.decode_ofdm(rx_grid)
            llr_n = jnp.concatenate([
                llr[..., : n_real], llr[..., : g.n_virtual],
                llr[..., n_real: n_real + g.ldpc_p]], axis=-1)
            dec, _it, _ok = ldpc.decode(llr_n.astype(jnp.float32),
                                        g.spec.ldpc_rate_num)
            got = np.asarray(dec)[:, :n_real]
            errs = (got != bits).sum(axis=-1)
            frame_errors += int((errs > 0).sum())
            bit_errors += int(errs.sum())
            frames += b
        return BerPoint(esn0_db, frames, frame_errors, bit_errors,
                        frames * n_real)

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
