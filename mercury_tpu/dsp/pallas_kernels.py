"""Pallas TPU kernels for the RX front end.

The hottest memory path in receive() is the passband->baseband front end:
the XLA version materializes the complex IQ array in HBM (mixer output) and
reads it back for the FIR convolution. The fused kernel below computes the
IQ mix and the decimating FIR in one VMEM pass per capture row — one HBM
read of the real passband samples, one HBM write of the decimated complex
baseband, nothing in between.

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


def _mix_fir_decimate_kernel(pb_ref, cos_ref, sin_ref, taps_ref,
                             out_re_ref, out_im_ref, *, stride: int,
                             ntaps: int, n_out: int):
    """One capture row: mix + decimating FIR entirely in VMEM.

    pb/cos/sin: [1, n_out*stride + ntaps - 1] (halo included)
    out:        [1, n_out]
    out[m] = sum_j taps[j] * (pb*osc)[m*stride + ntaps-1-j]
    """
    pb = pb_ref[0, :]
    i_arm = pb * cos_ref[0, :]
    q_arm = pb * sin_ref[0, :]
    acc_re = jnp.zeros((n_out,), jnp.float32)
    acc_im = jnp.zeros((n_out,), jnp.float32)
    for j in range(ntaps):
        start = ntaps - 1 - j
        sl_re = jax.lax.slice(i_arm, (start,), (start + n_out * stride,), (stride,))
        sl_im = jax.lax.slice(q_arm, (start,), (start + n_out * stride,), (stride,))
        acc_re = acc_re + taps_ref[j] * sl_re
        acc_im = acc_im + taps_ref[j] * sl_im
    out_re_ref[0, :] = acc_re
    out_im_ref[0, :] = acc_im


@functools.partial(jax.jit, static_argnames=("fs", "fc", "amp", "stride",
                                             "interpret"))
def mix_fir_decimate(pb: jnp.ndarray, taps: jnp.ndarray, fs: float, fc: float,
                     amp: float = float(np.sqrt(2.0)), stride: int = 4,
                     interpret: bool = False):
    """Fused mixer + decimating FIR: real passband [B, n] -> complex baseband
    [B, n//stride], equal to mix() -> fir_same() -> [::stride]."""
    b, n = pb.shape
    ntaps = int(taps.shape[0])
    center = (ntaps - 1) // 2
    n_out = n // stride

    # halo-pad, aligned like fir_same: out[m] reads
    # pb[m*stride - center .. m*stride + (ntaps-1-center)]
    left = center
    # total window the kernel's strided slices address: n_out*stride + ntaps-1
    right = n_out * stride + ntaps - 1 - left - n
    pb_pad = jnp.pad(pb.astype(jnp.float32), [(0, 0), (left, max(right, 0))])
    n_pad = pb_pad.shape[-1]
    t = jnp.arange(-left, n_pad - left, dtype=jnp.float32)
    ph = (2 * np.pi * fc / fs) * t
    cosv = (amp * jnp.cos(ph)).astype(jnp.float32)[None]
    sinv = (amp * jnp.sin(ph)).astype(jnp.float32)[None]

    kern = functools.partial(_mix_fir_decimate_kernel, stride=stride,
                             ntaps=ntaps, n_out=n_out)
    re, im = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ntaps,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, n_out), jnp.float32),
                   jax.ShapeDtypeStruct((b, n_out), jnp.float32)],
        interpret=interpret,
    )(pb_pad, cosv, sinv, taps.astype(jnp.float32))
    return re + 1j * im
