"""Pallas TPU kernels for the RX front end.

The hottest memory path in receive() is the passband->baseband front end:
the XLA version materializes the complex IQ array in HBM (mixer output) and
reads it back for the FIR convolution. The fused kernel below computes the
IQ mix and the decimating FIR in one VMEM pass per block of capture rows —
one HBM read of the real passband samples, one HBM write of the decimated
complex baseband, nothing in between.

Layout: Mosaic vectors only support unit-stride slices, so the decimating
FIR is expressed in polyphase form — the padded passband is deinterleaved
into `stride` phase planes on the host side of the call ([B, stride, n2]),
and each tap then reads a unit-stride slice of its phase plane:

    out[m] = sum_j taps[j] * arm[m*stride + ntaps-1-j]
           = sum_j taps[j] * armP[(ntaps-1-j) % stride][m + (ntaps-1-j)//stride]

Runs under interpret mode for CPU testing; falls back to the XLA composition
via dsp.ops on non-TPU backends in production code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8               # rows per grid step (TPU sublane granularity)
_osc_cache: dict = {}


def _osc_planes(n2: int, stride: int, left: int, fs: float, fc: float,
                amp: float) -> tuple[np.ndarray, np.ndarray]:
    """Host-precomputed mixer oscillator, phase-deinterleaved to match the
    polyphase passband layout: cos/sin [stride, n2] where plane p sample i
    is the oscillator at underlying index stride*i + p (t = index - left,
    float64 phase)."""
    key = (n2, stride, left, fs, fc, amp)
    arr = _osc_cache.get(key)
    if arr is None:
        t = np.arange(n2 * stride, dtype=np.float64) - left
        ph = (2 * np.pi * fc / fs) * t
        cos = (amp * np.cos(ph)).astype(np.float32).reshape(n2, stride).T
        sin = (amp * np.sin(ph)).astype(np.float32).reshape(n2, stride).T
        arr = (np.ascontiguousarray(cos), np.ascontiguousarray(sin))
        _osc_cache[key] = arr
    return arr


_TILE = 3840            # output samples per grid step (lane-aligned)
_HALO = 128             # extra phase-plane samples for the tap span


def _mix_fir_decimate_kernel(pb_ref, cos_ref, sin_ref, out_re_ref,
                             out_im_ref, *, taps: tuple, stride: int):
    """One (row-block, column-tile) step: mix + polyphase decimating FIR
    entirely in VMEM.

    pb: [R, stride, TILE+HALO] phase-plane window; cos/sin: [stride, same]
    out: [R, TILE]
    """
    ntaps = len(taps)
    rows = pb_ref.shape[0]
    n_out = out_re_ref.shape[-1]
    acc_re = jnp.zeros((rows, n_out), jnp.float32)
    acc_im = jnp.zeros((rows, n_out), jnp.float32)
    for p in range(stride):
        arm_i = pb_ref[:, p, :] * cos_ref[p, :]
        arm_q = pb_ref[:, p, :] * sin_ref[p, :]
        for j in range(ntaps):
            start = ntaps - 1 - j
            if start % stride != p:
                continue
            q = start // stride
            sl_i = jax.lax.slice(arm_i, (0, q), (rows, q + n_out))
            sl_q = jax.lax.slice(arm_q, (0, q), (rows, q + n_out))
            acc_re = acc_re + taps[j] * sl_i
            acc_im = acc_im + taps[j] * sl_q
    out_re_ref[...] = acc_re
    out_im_ref[...] = acc_im


@functools.partial(jax.jit, static_argnames=("taps", "fs", "fc", "amp",
                                             "stride", "interpret"))
def _mix_fir_decimate_impl(pb: jnp.ndarray, taps: tuple, fs: float, fc: float,
                           amp: float, stride: int, interpret: bool):
    b, n = pb.shape
    ntaps = len(taps)
    center = (ntaps - 1) // 2
    n_out = n // stride
    assert (ntaps - 1) // stride + 1 <= _HALO, "tap span exceeds halo"

    # halo-pad, aligned like fir_same: out[m] reads
    # pb[m*stride - center .. m*stride + (ntaps-1-center)]
    left = center
    n_tiles = -(-n_out // _TILE)
    n2 = n_tiles * _TILE + _HALO               # phase-plane length
    right = n2 * stride - left - n
    rpad = (-b) % _ROWS
    pb_pad = jnp.pad(pb.astype(jnp.float32),
                     [(0, rpad), (left, max(right, 0))])
    b_pad = pb_pad.shape[0]
    # deinterleave into phase planes: [B, n2, stride] -> [B, stride, n2]
    pb3 = jnp.swapaxes(pb_pad.reshape(b_pad, n2, stride), 1, 2)
    cosv, sinv = _osc_planes(n2, stride, left, fs, fc, amp)

    kern = functools.partial(_mix_fir_decimate_kernel, taps=taps,
                             stride=stride)
    win = _TILE + _HALO
    re, im = pl.pallas_call(
        kern,
        grid=(b_pad // _ROWS, n_tiles),
        in_specs=[
            pl.BlockSpec((pl.Element(_ROWS), pl.Element(stride),
                          pl.Element(win)),
                         lambda r, c: (r * _ROWS, 0, c * _TILE),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(stride), pl.Element(win)),
                         lambda r, c: (0, c * _TILE),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(stride), pl.Element(win)),
                         lambda r, c: (0, c * _TILE),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, _TILE), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _TILE), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b_pad, n_tiles * _TILE), jnp.float32),
                   jax.ShapeDtypeStruct((b_pad, n_tiles * _TILE), jnp.float32)],
        interpret=interpret,
    )(pb3, jnp.asarray(cosv), jnp.asarray(sinv))
    return (re + 1j * im)[:b, :n_out]


def mix_fir_decimate(pb: jnp.ndarray, taps, fs: float, fc: float,
                     amp: float = float(np.sqrt(2.0)), stride: int = 4,
                     interpret: bool = False):
    """Fused mixer + decimating FIR: real passband [B, n] -> complex baseband
    [B, n//stride], equal to mix() -> fir_same() -> [::stride]."""
    taps_t = tuple(float(t) for t in np.asarray(taps))
    return _mix_fir_decimate_impl(pb, taps_t, float(fs), float(fc),
                                  float(amp), int(stride), bool(interpret))


# ---------------------------------------------------------------------------
# Fused deep-sync matched-filter scoring.
#
# The deep-sync global acquisition correlates the known preamble against the
# ENTIRE decimated capture over a CFO-hypothesis bank (rx.py deep_sync).
# The XLA FFT-correlation formulation materializes the [B, A, Lp, nfft]
# correlation tensor (2.3 GB at CONFIG_0 wide-profile shapes) plus every
# scoring intermediate in HBM: measured 51.6 ms/apply on the chip, and
# swapping jnp.fft for the MXU matmul FFT only reached 47.3 ms — the stage
# is FUSION-bound, not transform-bound (docs/roofline_r3.json).
#
# This kernel keeps the whole pipeline in VMEM per (row-block, hypothesis):
#   product with the template spectrum -> inverse DFT as two MXU dot_general
#   stages (Cooley-Tukey nfft = n1*n2) -> |corr| -> energy-normalized
#   score accumulation over the Lp preamble symbols.
# HBM traffic: read the forward spectra + template bank, write the score —
# ~0.5 GB instead of ~15 GB.  Scoring math mirrors
# sync.matched_filter_refine_bank exactly (template norms pre-divided into
# the bank spectra; same silence-floor guard).
# ---------------------------------------------------------------------------

_MF_ROWS = 8

# matmul input dtype for the deep-MF inverse-DFT stages. The scores only
# arbitrate an argmax, so bfloat16 inputs (f32 accumulate) are a candidate;
# float32 is the shipped default — the kernel-level A/B and the threshold
# sensitivity check (tools/chip_session3_r3.py) decide.
DEEP_MF_MM_DTYPE = jnp.float32


def _deep_mf_kernel(xfr_ref, xfi_ref, bkr_ref, bki_ref, ce_ref, ef_ref,
                    w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
                    out_ref, *, lp: int, s: int, n1: int, n2: int,
                    nc_pad: int, mm_dtype):
    rows = xfr_ref.shape[0]
    xr = xfr_ref[...]
    xi = xfi_ref[...]
    ef = ef_ref[...]                                     # [RB, 1]
    w1r = w1r_ref[...].astype(mm_dtype)
    w1i = w1i_ref[...].astype(mm_dtype)
    w2r = w2r_ref[...].astype(mm_dtype)
    w2i = w2i_ref[...].astype(mm_dtype)
    twr = twr_ref[...]
    twi = twi_ref[...]
    dn = (((1,), (0,)), ((), ()))      # contract axis 1 of [RB, n, k]

    def dot1(x, w):
        return jax.lax.dot_general(x.astype(mm_dtype), w,
                                   dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    acc = jnp.zeros((rows, nc_pad), jnp.float32)
    for l in range(lp):
        tr = bkr_ref[0, l:l + 1, :]                      # [1, NF]
        ti = bki_ref[0, l:l + 1, :]
        pr = xr * tr - xi * ti                           # [RB, NF]
        pi = xr * ti + xi * tr
        # inverse DFT stage 1: contract n1 (index n = n1_idx*n2 + n2_idx,
        # so [RB, n1, n2] contracting axis 1 gives [RB, n2, k1])
        pr3 = pr.reshape(rows, n1, n2)
        pi3 = pi.reshape(rows, n1, n2)
        mr = dot1(pr3, w1r) - dot1(pi3, w1i)             # [RB, n2, k1]
        mi = dot1(pr3, w1i) + dot1(pi3, w1r)
        br = mr * twr - mi * twi
        bi = mr * twi + mi * twr
        # stage 2: contract n2 -> [RB, k1, k2]
        cr = dot1(br, w2r) - dot1(bi, w2i)
        ci = dot1(br, w2i) + dot1(bi, w2r)
        # lag d = k1 + n1*k2: flatten in [k2, k1] order
        cab = jnp.sqrt(cr * cr + ci * ci)
        cab = jnp.swapaxes(cab, 1, 2).reshape(rows, n1 * n2)
        c_l = jax.lax.slice(cab, (0, l * s), (rows, l * s + nc_pad))
        e_hi = jax.lax.slice(ce_ref[...], (0, l * s + s),
                             (rows, l * s + s + nc_pad))
        e_lo = jax.lax.slice(ce_ref[...], (0, l * s), (rows, l * s + nc_pad))
        e_l = e_hi - e_lo
        term = c_l * jax.lax.rsqrt(jnp.maximum(e_l, ef))
        acc = acc + jnp.where(e_l > ef, term, 0.0)
    out_ref[0, :, :] = acc


def _deep_mf_max_kernel(xfr_ref, xfi_ref, bkr_ref, bki_ref, ce_ref, ef_ref,
                        w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
                        smax_ref, sarg_ref, *, lp: int, s: int, n1: int,
                        n2: int, nc_pad: int, mm_dtype):
    """deep_mf_score body, max-reduced over the hypothesis axis IN-KERNEL:
    the grid iterates `a` innermost with constant output index maps, so the
    [RB, nc_pad] running max/argmax stay VMEM-resident across the whole
    bank — the [B, A, n_cand] score tensor (895 MB at the round-5 coherent
    cfg0 shapes) never exists in HBM."""
    rows = xfr_ref.shape[0]
    a_idx = pl.program_id(1)
    xr = xfr_ref[...]
    xi = xfi_ref[...]
    ef = ef_ref[...]
    w1r = w1r_ref[...].astype(mm_dtype)
    w1i = w1i_ref[...].astype(mm_dtype)
    w2r = w2r_ref[...].astype(mm_dtype)
    w2i = w2i_ref[...].astype(mm_dtype)
    twr = twr_ref[...]
    twi = twi_ref[...]
    dn = (((1,), (0,)), ((), ()))

    def dot1(x, w):
        return jax.lax.dot_general(x.astype(mm_dtype), w,
                                   dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    acc = jnp.zeros((rows, nc_pad), jnp.float32)
    for l in range(lp):
        tr = bkr_ref[0, l:l + 1, :]
        ti = bki_ref[0, l:l + 1, :]
        pr = xr * tr - xi * ti
        pi = xr * ti + xi * tr
        pr3 = pr.reshape(rows, n1, n2)
        pi3 = pi.reshape(rows, n1, n2)
        mr = dot1(pr3, w1r) - dot1(pi3, w1i)
        mi = dot1(pr3, w1i) + dot1(pi3, w1r)
        br = mr * twr - mi * twi
        bi = mr * twi + mi * twr
        cr = dot1(br, w2r) - dot1(bi, w2i)
        ci = dot1(br, w2i) + dot1(bi, w2r)
        cab = jnp.sqrt(cr * cr + ci * ci)
        cab = jnp.swapaxes(cab, 1, 2).reshape(rows, n1 * n2)
        c_l = jax.lax.slice(cab, (0, l * s), (rows, l * s + nc_pad))
        e_hi = jax.lax.slice(ce_ref[...], (0, l * s + s),
                             (rows, l * s + s + nc_pad))
        e_lo = jax.lax.slice(ce_ref[...], (0, l * s), (rows, l * s + nc_pad))
        e_l = e_hi - e_lo
        term = c_l * jax.lax.rsqrt(jnp.maximum(e_l, ef))
        acc = acc + jnp.where(e_l > ef, term, 0.0)

    @pl.when(a_idx == 0)
    def _init():
        smax_ref[...] = acc
        sarg_ref[...] = jnp.zeros((rows, nc_pad), jnp.int32)

    @pl.when(a_idx != 0)
    def _update():
        prev = smax_ref[...]
        better = acc > prev
        smax_ref[...] = jnp.where(better, acc, prev)
        sarg_ref[...] = jnp.where(better, a_idx, sarg_ref[...])


def deep_mf_score(seg: jnp.ndarray, bank: np.ndarray, window: int,
                  nfft: int, interpret: bool | None = None,
                  mm_dtype=None) -> jnp.ndarray:
    """Fused deep-sync matched-filter scores: seg [B, L] complex64,
    bank [A, Lp, S] complex templates, scored at lags 0..2*window.

    Returns score [B, A, 2*window+1], numerically matching the
    sync.matched_filter_refine_bank FFT path (before its final /Lp)."""
    from mercury_tpu.dsp import ops as _ops

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mm_dtype is None:
        mm_dtype = DEEP_MF_MM_DTYPE
    b, seg_len = seg.shape
    a, lp, s = bank.shape
    n_cand = 2 * window + 1
    nc_pad = -(-n_cand // 128) * 128
    # The kernel slices lag runs [l*s, l*s + nc_pad) out of an nfft-point
    # circular correlation, so the padded lag support must fit inside the
    # transform. A geometry with small decimated symbol length s and a
    # buffer just under a power of two can violate this — grow the
    # transform (zero-padding is free correctness-wise) instead of
    # asserting (ADVICE r3).
    while nfft < seg_len or (lp - 1) * s + nc_pad > nfft:
        nfft *= 2
    n1, n2 = _ops._fft_mm_factor(nfft)

    # forward spectra (cheap: one matmul FFT over [B, L]) — f32 planes at
    # the pallas_call boundary (the TPU runtime cannot pass complex)
    xf = _ops.fft_mm(seg, n=nfft)
    xfr = jnp.real(xf)
    xfi = jnp.imag(xf)

    # template spectra, conjugated for correlation, pre-divided by the
    # per-(a,l) template norms so the kernel needs no t_norm input
    t_norm = np.sqrt(np.sum(np.abs(bank) ** 2, axis=-1))     # [A, Lp]
    bankn = np.asarray(bank) / t_norm[..., None]
    tfc = np.conj(np.fft.fft(bankn, n=nfft, axis=-1)).astype(np.complex64)
    bkr = jnp.asarray(np.ascontiguousarray(tfc.real))
    bki = jnp.asarray(np.ascontiguousarray(tfc.imag))

    # energy prefix sums + silence floor (identical to the XLA scoring)
    e = jnp.abs(seg) ** 2
    ce = jnp.concatenate([jnp.zeros_like(e[..., :1]),
                          jnp.cumsum(e, axis=-1)], axis=-1)
    ce_len = lp * s + nc_pad
    if ce.shape[-1] < ce_len:
        ce = jnp.pad(ce, [(0, 0), (0, ce_len - ce.shape[-1])], mode="edge")
    else:
        ce = ce[..., :ce_len]
    ef = (1e-4 * jnp.mean(e, axis=-1, keepdims=True) * s + 1e-20
          ).astype(jnp.float32)

    w1r, w1i, twr, twi, w2r, w2i = (
        jnp.asarray(m) for m in _ops._fft_mm_mats(n1, n2, True, np.float32))

    rpad = (-b) % _MF_ROWS
    if rpad:
        xfr = jnp.pad(xfr, [(0, rpad), (0, 0)])
        xfi = jnp.pad(xfi, [(0, rpad), (0, 0)])
        ce = jnp.pad(ce, [(0, rpad), (0, 0)])
        ef = jnp.pad(ef, [(0, rpad), (0, 0)], constant_values=1.0)
    bp = b + rpad

    kern = functools.partial(_deep_mf_kernel, lp=lp, s=s, n1=n1, n2=n2,
                             nc_pad=nc_pad, mm_dtype=mm_dtype)
    row_spec = lambda r, a_: (r, 0)                      # noqa: E731
    score = pl.pallas_call(
        kern,
        grid=(bp // _MF_ROWS, a),
        in_specs=[
            pl.BlockSpec((_MF_ROWS, nfft), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((_MF_ROWS, nfft), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, nfft), lambda r, a_: (a_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, nfft), lambda r, a_: (a_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_MF_ROWS, ce_len), row_spec,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_MF_ROWS, 1), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n1), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n1), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n1), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n1), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # score laid out [A, B, nc]: Mosaic requires the last two block
        # dims to be (8, 128)-divisible (or full), which (RB, nc_pad) is
        # and (1, nc_pad) would not be
        out_specs=pl.BlockSpec((1, _MF_ROWS, nc_pad),
                               lambda r, a_: (a_, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a, bp, nc_pad), jnp.float32),
        interpret=interpret,
    )(xfr, xfi, bkr, bki, ce, ef, w1r, w1i, twr, twi, w2r, w2i)
    return jnp.swapaxes(score[:, :b, :n_cand], 0, 1)


def deep_mf_max(seg: jnp.ndarray, bank: np.ndarray, window: int,
                nfft: int, interpret: bool | None = None,
                mm_dtype=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """deep_mf_score max-reduced over the hypothesis axis in-kernel:
    returns (smax [B, n_cand] f32, sarg [B, n_cand] int32) — the running
    max and argmax over the A bank rows, without materializing the
    [B, A, n_cand] score tensor in HBM. Exact same per-row scoring as
    deep_mf_score (tests/test_pilot_kernel.py parity)."""
    from mercury_tpu.dsp import ops as _ops

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mm_dtype is None:
        mm_dtype = DEEP_MF_MM_DTYPE
    b, seg_len = seg.shape
    a, lp, s = bank.shape
    n_cand = 2 * window + 1
    nc_pad = -(-n_cand // 128) * 128
    while nfft < seg_len or (lp - 1) * s + nc_pad > nfft:
        nfft *= 2
    n1, n2 = _ops._fft_mm_factor(nfft)

    xf = _ops.fft_mm(seg, n=nfft)
    xfr = jnp.real(xf)
    xfi = jnp.imag(xf)

    t_norm = np.sqrt(np.sum(np.abs(bank) ** 2, axis=-1))     # [A, Lp]
    bankn = np.asarray(bank) / t_norm[..., None]
    tfc = np.conj(np.fft.fft(bankn, n=nfft, axis=-1)).astype(np.complex64)
    bkr = jnp.asarray(np.ascontiguousarray(tfc.real))
    bki = jnp.asarray(np.ascontiguousarray(tfc.imag))

    e = jnp.abs(seg) ** 2
    ce = jnp.concatenate([jnp.zeros_like(e[..., :1]),
                          jnp.cumsum(e, axis=-1)], axis=-1)
    ce_len = lp * s + nc_pad
    if ce.shape[-1] < ce_len:
        ce = jnp.pad(ce, [(0, 0), (0, ce_len - ce.shape[-1])], mode="edge")
    else:
        ce = ce[..., :ce_len]
    ef = (1e-4 * jnp.mean(e, axis=-1, keepdims=True) * s + 1e-20
          ).astype(jnp.float32)

    w1r, w1i, twr, twi, w2r, w2i = (
        jnp.asarray(m) for m in _ops._fft_mm_mats(n1, n2, True, np.float32))

    rpad = (-b) % _MF_ROWS
    if rpad:
        xfr = jnp.pad(xfr, [(0, rpad), (0, 0)])
        xfi = jnp.pad(xfi, [(0, rpad), (0, 0)])
        ce = jnp.pad(ce, [(0, rpad), (0, 0)])
        ef = jnp.pad(ef, [(0, rpad), (0, 0)], constant_values=1.0)
    bp = b + rpad

    kern = functools.partial(_deep_mf_max_kernel, lp=lp, s=s, n1=n1, n2=n2,
                             nc_pad=nc_pad, mm_dtype=mm_dtype)
    row_spec = lambda r, a_: (r, 0)                      # noqa: E731
    smax, sarg = pl.pallas_call(
        kern,
        grid=(bp // _MF_ROWS, a),
        in_specs=[
            pl.BlockSpec((_MF_ROWS, nfft), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((_MF_ROWS, nfft), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, nfft), lambda r, a_: (a_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, nfft), lambda r, a_: (a_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_MF_ROWS, ce_len), row_spec,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_MF_ROWS, 1), row_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n1), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n1), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n1), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n1), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda r, a_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # outputs revisit the SAME block for every a (index map ignores
        # a_; a is the innermost grid dim) -> VMEM-resident running max
        out_specs=[
            pl.BlockSpec((_MF_ROWS, nc_pad), row_spec,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_MF_ROWS, nc_pad), row_spec,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((bp, nc_pad), jnp.float32),
                   jax.ShapeDtypeStruct((bp, nc_pad), jnp.int32)],
        interpret=interpret,
    )(xfr, xfi, bkr, bki, ce, ef, w1r, w1i, twr, twi, w2r, w2i)
    return smax[:b, :n_cand], sarg[:b, :n_cand]


# ---------------------------------------------------------------------------
# Per-candidate pilot-lattice scoring (round 5).
#
# The pilot arbitration stage scores M candidate frame starts per batch row
# against per-symbol pilot-only waveforms. The XLA formulation (vmapped
# dynamic_slice -> [B, M, Nsymb*S_d] segments) lowers to an ELEMENT-rate
# gather on TPU (~1.8 ms per candidate at cfg0 — measured round 5, the same
# phenomenon as LDPC BP's gather bound, docs/roofline_r2.md), which made
# arbitration depth M the dominant deep-chain cost. Here the batch row
# stays VMEM-resident: per (row, candidate) the segment is ONE contiguous
# 1-D dynamic slice, the per-symbol reductions are a single [M, S] x
# [S, Nsymb] one-hot segment-sum MATMUL on the MXU, and only the [B, M]
# score surface leaves the kernel.

_PIL_ROWS = 8


def _pilot_score_kernel(row_re_ref, row_im_ref, idx_ref, fid_ref,
                        bkr_ref, bki_ref, seg_mat_ref, ef_ref, out_ref,
                        *, m: int, s_tot: int, nsym: int, l_ext: int):
    rows = row_re_ref.shape[0]
    chunk = 8     # candidates per MXU dot — bounds live VMEM to ~0.6 MB
    seg_mat = seg_mat_ref[...]                               # [S, Nsym]
    for r in range(rows):
        ef = ef_ref[r, 0]
        for c0 in range(0, m, chunk):
            mc = min(chunk, m - c0)
            srs, sis, brs, bis = [], [], [], []
            for j in range(c0, c0 + mc):
                st = idx_ref[r, j]
                f = fid_ref[r, j]
                # Mosaic lane-dim dynamic slices must start at a provable
                # multiple of 128: slice the aligned superset and rotate
                # the sub-128 residual in-register (tpu dynamic rotate)
                q = st // 128
                lo = st - q * 128
                er = row_re_ref[r, pl.ds(q * 128, l_ext)][None, :]
                ei = row_im_ref[r, pl.ds(q * 128, l_ext)][None, :]
                # positive-shift form: Mosaic's dynamic rotate and the
                # interpret path agree on non-negative shifts only
                # (negative dynamic shifts measured 48% wrong on hardware,
                # round 5); right-rotate by l_ext-lo == left-shift by lo
                er = pltpu.roll(er, l_ext - lo, 1)
                ei = pltpu.roll(ei, l_ext - lo, 1)
                srs.append(er[:, :s_tot])                    # [1, S]
                sis.append(ei[:, :s_tot])
                brs.append(bkr_ref[f, pl.ds(0, s_tot)][None, :])
                bis.append(bki_ref[f, pl.ds(0, s_tot)][None, :])
            # stack THEN multiply: full-sublane [mc, S] elementwise ops
            # instead of 3*mc ops on [1, S] vectors (7/8 of each vreg idle)
            sr = jnp.concatenate(srs, axis=0)                # [mc, S]
            si = jnp.concatenate(sis, axis=0)
            br = jnp.concatenate(brs, axis=0)
            bi = jnp.concatenate(bis, axis=0)
            # bank is host-conjugated + per-symbol normalized, so the
            # correlation is sum(seg * bk) and |.| needs no extra norm
            p_re = sr * br - si * bi                         # Re(seg*bk)
            p_im = sr * bi + si * br
            p_e = sr * sr + si * si
            c_re = jnp.dot(p_re, seg_mat,
                           preferred_element_type=jnp.float32)
            c_im = jnp.dot(p_im, seg_mat,
                           preferred_element_type=jnp.float32)
            e_s = jnp.dot(p_e, seg_mat,
                          preferred_element_type=jnp.float32)
            term = jnp.sqrt(c_re * c_re + c_im * c_im) * jax.lax.rsqrt(
                jnp.maximum(e_s, ef))
            out_ref[r, c0:c0 + mc] = jnp.sum(
                jnp.where(e_s > ef, term, 0.0), axis=-1)


def pilot_cand_score(bb_dec: jnp.ndarray, idx0: jnp.ndarray,
                     fidx: jnp.ndarray, bank: np.ndarray,
                     interpret: bool | None = None) -> jnp.ndarray:
    """score [B, M]: per-candidate pilot correlation, coherent within each
    symbol / noncoherent across symbols, matching sync.pilot_rescore's XLA
    scoring on the same pre-decimated inputs.

    bb_dec: [B, n_dec] complex64 (mf_d-rate baseband); idx0 [B, M] int32
    starts into bb_dec; fidx [B, M] int32 CFO-grid rows; bank [F, Nsym,
    S_d] complex (pilot-only symbol templates, NOT conjugated/normalized —
    handled here)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n_dec = bb_dec.shape
    m = idx0.shape[1]
    f_n, nsym, s_d = bank.shape
    s_tot = nsym * s_d

    bank = np.asarray(bank)
    e_t = np.sqrt(np.sum(np.abs(bank) ** 2, axis=-1))        # [F, Nsym]
    bkn = np.conj(bank) / np.maximum(e_t[..., None], 1e-30)
    bkr = jnp.asarray(np.ascontiguousarray(
        bkn.real.reshape(f_n, s_tot).astype(np.float32)))
    bki = jnp.asarray(np.ascontiguousarray(
        bkn.imag.reshape(f_n, s_tot).astype(np.float32)))
    # one-hot segment-sum matrix [S, Nsym]
    seg_mat = np.zeros((s_tot, nsym), np.float32)
    seg_mat[np.arange(s_tot), np.arange(s_tot) // s_d] = 1.0
    seg_mat = jnp.asarray(seg_mat)

    re = jnp.real(bb_dec).astype(jnp.float32)
    im = jnp.imag(bb_dec).astype(jnp.float32)
    # silence floor per row (guards the normalized score in exact silence;
    # sync.pilot_rescore uses the same 1e-4 x mean-window-energy scale)
    ef = (1e-4 * jnp.mean(re * re + im * im, axis=-1, keepdims=True)
          * s_d + 1e-20).astype(jnp.float32)

    idx0 = jnp.clip(idx0, 0, max(n_dec - s_tot, 0)).astype(jnp.int32)
    fidx = jnp.clip(fidx, 0, f_n - 1).astype(jnp.int32)

    # aligned-superset slice length (start rounded DOWN to 128, so the
    # window must cover s_tot plus the <=127 residual), lane-padded
    l_ext = (-(-(s_tot + 128) // 128)) * 128
    re = jnp.pad(re, [(0, 0), (0, l_ext)])
    im = jnp.pad(im, [(0, 0), (0, l_ext)])
    n_dec_p = re.shape[-1]

    rpad = (-b) % _PIL_ROWS
    if rpad:
        re = jnp.pad(re, [(0, rpad), (0, 0)])
        im = jnp.pad(im, [(0, rpad), (0, 0)])
        idx0 = jnp.pad(idx0, [(0, rpad), (0, 0)])
        fidx = jnp.pad(fidx, [(0, rpad), (0, 0)])
        ef = jnp.pad(ef, [(0, rpad), (0, 0)], constant_values=1.0)
    bp = b + rpad

    kern = functools.partial(_pilot_score_kernel, m=m, s_tot=s_tot,
                            nsym=nsym, l_ext=l_ext)
    row_spec = lambda r: (r, 0)                              # noqa: E731
    score = pl.pallas_call(
        kern,
        grid=(bp // _PIL_ROWS,),
        in_specs=[
            pl.BlockSpec((_PIL_ROWS, n_dec_p), row_spec,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PIL_ROWS, n_dec_p), row_spec,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PIL_ROWS, m), row_spec,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_PIL_ROWS, m), row_spec,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((f_n, s_tot), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_n, s_tot), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_tot, nsym), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PIL_ROWS, 1), row_spec,
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_PIL_ROWS, m), row_spec,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, m), jnp.float32),
        interpret=interpret,
    )(re, im, idx0, fidx, bkr, bki, seg_mat, ef)
    return score[:b]
