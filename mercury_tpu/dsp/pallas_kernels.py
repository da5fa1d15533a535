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
