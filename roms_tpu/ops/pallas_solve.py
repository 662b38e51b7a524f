"""Pallas TPU kernel for the implicit vertical momentum solve.

The jnp `vmix.momentum_implicit` runs two lax.scan recurrences over nz;
on TPU every scan iteration round-trips its (jy, ix) carry through HBM
and blocks fusion (measured ~2 ms per solve at 384x192x60, vs a ~0.11 ms
single-pass traffic floor; 4 solves per step — ROOFLINE.md).  This
kernel runs the whole Thomas elimination with the column resident in
VMEM, one row-block grid, no horizontal stencil (the caller has already
face-averaged every input), transcribing the jnp arithmetic 1:1
(reference: pre_step3d4S.F:377-424 / step3d_uv1.F:146-206,
IMPLCT_NO_SLIP_BTTM_BC bottom drag set_global_definitions.h:73).

The jnp path remains the f64 oracle; interpret-mode equivalence is
tested in tests/test_pallas_solve.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roms_tpu.config import ModelConfig
from roms_tpu.ops.pallas_tracer import BJ, _INTERPRET


def _kernel(rhs_ref, hzf_ref, akvf_ref, wif_ref, dc0_ref, sstr_ref,
            rd_ref, out_ref, *, dtau: float, nz: int, drag: bool):
    rhs = [rhs_ref[k] for k in range(nz)]
    hzf = [hzf_ref[k] for k in range(nz)]
    dc0 = dc0_ref[:]

    fcv = [2.0 * dtau * akvf_ref[j + 1] / (hzf[j + 1] + hzf[j])
           for j in range(nz - 1)]
    wcv = [dc0 * wif_ref[j + 1] for j in range(nz - 1)]
    wc_p = [jnp.maximum(w, 0.0) for w in wcv]
    wc_m = [jnp.minimum(w, 0.0) for w in wcv]

    top_rhs = rhs[nz - 1] + dtau * sstr_ref[:]
    cff_top = 1.0 / (hzf[nz - 1] + fcv[nz - 2] - wc_m[nz - 2])
    cf = [None] * nz          # CF at interface c (c = 1..nz-1)
    dc = [None] * nz          # DC at cell c     (c = 1..nz-1)
    cf[nz - 1] = cff_top * (fcv[nz - 2] + wc_p[nz - 2])
    dc[nz - 1] = cff_top * top_rhs

    for c in range(nz - 2, 0, -1):
        cff = 1.0 / (hzf[c] + fcv[c - 1] - wc_m[c - 1]
                     + fcv[c] + wc_p[c]
                     - cf[c + 1] * (fcv[c] - wc_m[c]))
        cf[c] = cff * (fcv[c - 1] + wc_p[c - 1])
        dc[c] = cff * (rhs[c] + dc[c + 1] * (fcv[c] - wc_m[c]))

    denom = hzf[0] + fcv[0] + wc_p[0] - cf[1] * (fcv[0] - wc_m[0])
    if drag:
        denom = denom + dtau * rd_ref[:]
    below = (rhs[0] + dc[1] * (fcv[0] - wc_m[0])) / denom
    out_ref[0] = below
    for c in range(1, nz):
        below = dc[c] + cf[c] * below
        out_ref[c] = below


def momentum_implicit(rhs, hz_face, akv_face, wi_face, dc0, dtau, sstr,
                      cfg: ModelConfig, bottom_drag_coeff=None):
    """Drop-in fused replacement for vmix.momentum_implicit."""
    nz, jy, ix = rhs.shape
    dtype = rhs.dtype
    jy_p = -(-jy // BJ) * BJ
    nj = jy_p // BJ

    rpad = (lambda a: jnp.pad(
        a, [(0, 0)] * (a.ndim - 2) + [(0, jy_p - jy), (0, 0)],
        mode="edge")) if jy_p != jy else (lambda a: a)

    drag = bottom_drag_coeff is not None
    rd = rpad(bottom_drag_coeff) if drag else jnp.zeros((jy_p, ix), dtype)

    jm3 = lambda r: (0, r, 0)
    jm2 = lambda r: (r, 0)
    vspec = pltpu.VMEM
    try:
        comp = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
    except AttributeError:
        comp = pltpu.TPUCompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    out = pl.pallas_call(
        functools.partial(_kernel, dtau=float(dtau), nz=nz, drag=drag),
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((nz, BJ, ix), jm3, memory_space=vspec),
            pl.BlockSpec((nz, BJ, ix), jm3, memory_space=vspec),
            pl.BlockSpec((nz + 1, BJ, ix), jm3, memory_space=vspec),
            pl.BlockSpec((nz + 1, BJ, ix), jm3, memory_space=vspec),
            pl.BlockSpec((BJ, ix), jm2, memory_space=vspec),
            pl.BlockSpec((BJ, ix), jm2, memory_space=vspec),
            pl.BlockSpec((BJ, ix), jm2, memory_space=vspec),
        ],
        out_specs=pl.BlockSpec((nz, BJ, ix), jm3, memory_space=vspec),
        out_shape=jax.ShapeDtypeStruct((nz, jy_p, ix), dtype),
        compiler_params=comp,
        interpret=_INTERPRET,
    )(rpad(rhs), rpad(hz_face), rpad(akv_face), rpad(wi_face),
      rpad(dc0), rpad(sstr), rd)
    if jy_p != jy:
        out = out[:, :jy]
    return out
