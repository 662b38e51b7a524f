"""Fused Pallas TPU kernel for one tracer stage (predictor or corrector).

The XLA tracer engine materializes every stencil intermediate in HBM
(measured at 384x192x60 x nt=34, f32: 28.3 GB for the horizontal fluxes,
7.3 GB for the spline pass alone — ROOFLINE.md), because the scan-based
vertical solves and the edge scatters break fusion.  This kernel runs the
whole per-tracer stage in one pass over memory (reference physics:
src/compute_horiz_tracer_fluxes.h UPSTREAM3/CENTERED4/AKIMA horizontal
fluxes, src/compute_vert_tracer_fluxes.h SPLINE_TS vertical flux,
src/pre_step3d4S.F:216-263 / src/step3d_t_ISO.F:1044-1100 implicit
vertical diffusion+advection tridiagonal):

    t_new = IMPLICIT( hz_pre*(c_tk*tk + c_sec*t_sec)
                      - dtau*pmn*div_h(FX, FE)
                      - dtau*pmn*div_v(spline_iface * We)
                      [+ dtau*stflx at the surface] )

per (j-block, tracer) grid step with whole columns resident in VMEM.

Pipelining is pure BlockSpec: each halo-consuming field is passed twice,
as two row-block views shifted by one block (rows r*BJ and (r+1)*BJ of a
row-padded array), and the kernel concatenates them and slices the
actual stencil window.  This needs no manual HBM DMA (whose sliced
-memref forms are fragile under Mosaic) and the pipeline fetches
t-independent views only once per row block (their block index does not
change while the tracer grid dimension advances).  HBM traffic per
stage: the nt-sized fields move ~2x (double view) for tk, 1x for t_sec
and the output; the shared 3D fields once per row block.

Semantics match the jnp path: `shift` is `jnp.roll` on the padded array,
reproduced by wrap-padding the halo-consuming inputs by 2 (jnp.pad
mode='wrap' == roll indexing), so even the ring/ghost values — later
overwritten by the BC kernels exactly as in the reference — agree.

Scope: single-block TPU stepping without point sources / isoneutral /
upscale capture / budgets (see `usable`); every other configuration,
and the f64 CPU oracle path, keeps the jnp engine.  The corrector's KPP
solar/nonlocal terms are folded into t_sec by the caller (additive
terms commute into the base content at c_sec=1).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roms_tpu.config import AdvScheme, ModelConfig

C_UP3_TS = 0.1666666666666666     # (reference: compute_horiz_tracer_fluxes.h:106)
C_CEN4_TS = 0.3333333333333333    # (reference: compute_horiz_tracer_fluxes.h:110)
EPSIL = 1.0e-33

BJ = int(os.environ.get("ROMS_TPU_PALLAS_BJ", "8"))   # j-rows per block (f32 sublane tile multiple)

_INTERPRET = os.environ.get("ROMS_TPU_PALLAS", "") == "interpret"

# dev-only ablation knobs (scripts/bench_stage.py): skip kernel sections
# to attribute stage time; NEVER set in production paths
_SKIP = os.environ.get("ROMS_TPU_PALLAS_SKIP", "")


def usable(cfg: ModelConfig) -> bool:
    """Whether the fused kernel covers this configuration's tracer stage."""
    # pipe sources fold into t_sec at the call site (stepper); river
    # sources modify the advective face fluxes inside the stencil and
    # stay on the jnp engine
    return (not cfg.river_source
            and not cfg.adv_isoneutral and not cfg.upscale_output
            and not cfg.tracer_diagnostics
            and cfg.pad_e == 0 and cfg.pad_n == 0)


def _kernel(tka_ref, tkb_ref, fu_ref, fva_ref, fvb_ref,
            uma_ref, umb_ref, vma_ref, vmb_ref,
            tsec_ref, hza_ref, hzb_ref, we_ref, wi_ref, akt_ref,
            pmn_ref, rmask_ref, stflx_ref, own_ref,
            *rest,
            cfg: ModelConfig, scheme: AdvScheme, dtau: float,
            c_tk: float, c_sec: float, apply_mask: bool, surface: bool,
            mode: str, ix: int, nz: int, jy: int, mix: bool):
    if mix:
        (d2a_ref, d2b_ref, hzma_ref, hzmb_ref, pua_ref, pub_ref,
         pva_ref, pvb_ref, out_ref) = rest
    else:
        out_ref, = rest
    # physical-edge ownership (1.0 on shards whose block touches that
    # domain edge; all-ones single-block — reference: per-rank
    # WESTERN_EDGE etc. tests, src/compute_horiz_tracer_fluxes.h:74-83)
    own_w = own_ref[0, 0] > 0.5
    own_e = own_ref[0, 1] > 0.5
    own_s = own_ref[0, 2] > 0.5
    own_n = own_ref[0, 3] > 0.5
    r = pl.program_id(0)
    r0 = r * BJ
    bj = BJ

    # ---- assemble the stencil row windows from the two block views ------
    tkw = jnp.concatenate([tka_ref[0], tkb_ref[0]], axis=-2)[:, :bj + 4, :]
    um = jnp.concatenate([uma_ref[:], umb_ref[:]], axis=-2)[:bj + 4, :]
    vm = jnp.concatenate([vma_ref[:], vmb_ref[:]], axis=-2)[:bj + 4, :]
    fvw = jnp.concatenate([fva_ref[:], fvb_ref[:]], axis=-2)[:, :bj + 1, :]
    pmn = pmn_ref[:]

    # hz fields (reference: pre_step3d4S.F Hz_bak/Hz_fwd pseudo-
    # compressible split vs step3d_t_ISO.F Hz(n)/Hz(n+1)); hz_pre is
    # applied in 3D form below (hz_pre3)
    if mode == "pred":
        hz_spl3 = hza_ref[:]                         # Hz(n)
        hz_imp3 = hza_ref[:] - hzb_ref[:]            # Hz_fwd
    else:
        hz_spl3 = hzb_ref[:]                         # Hz(n+1)
        hz_imp3 = hz_spl3
    hz_spl = [hz_spl3[k] for k in range(nz)]
    hz_imp = [hz_imp3[k] for k in range(nz)]

    # ---- horizontal fluxes + divergence, all levels at once -------------
    # Index map: wrapped col w == jnp col w-2; wrapped row of the tile is
    # jnp row r0 + w - 2.  dx[c] (u-point) == dxw[c+1] where
    # dxw[i] = tk[w=i+1] - tk[w=i]; de[rr] (v-point) == dew[rr-r0+1].
    # Vectorized over the whole (nz, bj+4, ix+4) window: fewer, larger
    # VPU ops than a per-level loop (the stage is dispatch/compute-bound,
    # not bandwidth-bound, at this tile size).
    rows_o = slice(2, 2 + bj)
    cols_o = slice(2, ix + 2)
    if "horiz" in _SKIP:      # dev ablation: kernel = pure streams + axpy
        tc3 = tkw[:, rows_o, cols_o]
        if mode == "pred":
            hz_pre3 = hza_ref[:] + hzb_ref[:]
        else:
            hz_pre3 = hza_ref[:]
        out_ref[0] = hz_pre3 * (c_tk * tc3 + c_sec * tsec_ref[0])
        return
    dxw = tkw[:, :, 1:] - tkw[:, :, :-1]
    if cfg.masking:
        dxw = dxw * um[:, 1:]
    if not cfg.ew_periodic:
        # jnp: dx[:,1] = dx[:,2]; dx[:,ix-1] = dx[:,ix-2]
        col = jax.lax.broadcasted_iota(jnp.int32, dxw.shape, 2)
        src_w = jnp.concatenate([dxw[:, :, 1:], dxw[:, :, -1:]], axis=2)
        src_e = jnp.concatenate([dxw[:, :, :1], dxw[:, :, :-1]], axis=2)
        dxw = jnp.where((col == 2) & own_w, src_w, dxw)
        dxw = jnp.where((col == ix) & own_e, src_e, dxw)
    tk_c = tkw[:, rows_o, 2:ix + 3]
    tk_cm = tkw[:, rows_o, 1:ix + 2]
    dx_c = dxw[:, rows_o, 1:ix + 2]
    dx_cm = dxw[:, rows_o, 0:ix + 1]
    dx_cp = dxw[:, rows_o, 2:ix + 3]
    fu = fu_ref[:]                                     # (nz, bj, ix+1)
    if scheme is AdvScheme.UPSTREAM3:
        fx = (0.5 * (tk_c + tk_cm) * fu
              - C_UP3_TS * ((dx_c - dx_cm) * jnp.maximum(fu, 0.0)
                            + (dx_cp - dx_c) * jnp.minimum(fu, 0.0)))
    elif scheme is AdvScheme.AKIMA:
        cffp = 2.0 * dx_cp * dx_c
        gr_c = jnp.where(cffp > EPSIL, cffp / (dx_cp + dx_c), 0.0)
        cffm = 2.0 * dx_c * dx_cm
        gr_cm = jnp.where(cffm > EPSIL, cffm / (dx_c + dx_cm), 0.0)
        fx = 0.5 * (tk_c + tk_cm - C_CEN4_TS * (gr_c - gr_cm)) * fu
    else:  # CENTERED4
        fx = 0.5 * (tk_c + tk_cm
                    - C_CEN4_TS * (0.5 * (dx_cp + dx_c)
                                   - 0.5 * (dx_c + dx_cm))) * fu

    dew = tkw[:, 1:, :] - tkw[:, :-1, :]
    if cfg.masking:
        dew = dew * vm[1:, :]
    if not cfg.ns_periodic:
        # jnp: de[1] = de[2]; de[jy-1] = de[jy-2] (true jy, not padded)
        rowi = (jax.lax.broadcasted_iota(jnp.int32, dew.shape, 1)
                + (r0 - 1))
        src_s = jnp.concatenate([dew[:, 1:, :], dew[:, -1:, :]], axis=1)
        src_n = jnp.concatenate([dew[:, :1, :], dew[:, :-1, :]], axis=1)
        dew = jnp.where((rowi == 1) & own_s, src_s, dew)
        dew = jnp.where((rowi == jy - 1) & own_n, src_n, dew)
    tk_r = tkw[:, 2:bj + 3, cols_o]
    tk_rm = tkw[:, 1:bj + 2, cols_o]
    de_r = dew[:, 1:bj + 2, cols_o]
    de_rm = dew[:, 0:bj + 1, cols_o]
    de_rp = dew[:, 2:bj + 3, cols_o]
    fv = fvw                                           # (nz, bj+1, ix)
    if scheme is AdvScheme.UPSTREAM3:
        fe = (0.5 * (tk_r + tk_rm) * fv
              - C_UP3_TS * ((de_r - de_rm) * jnp.maximum(fv, 0.0)
                            + (de_rp - de_r) * jnp.minimum(fv, 0.0)))
    elif scheme is AdvScheme.AKIMA:
        cffp = 2.0 * de_rp * de_r
        gr_r = jnp.where(cffp > EPSIL, cffp / (de_rp + de_r), 0.0)
        cffm = 2.0 * de_r * de_rm
        gr_rm = jnp.where(cffm > EPSIL, cffm / (de_r + de_rm), 0.0)
        fe = 0.5 * (tk_r + tk_rm - C_CEN4_TS * (gr_r - gr_rm)) * fv
    else:
        fe = 0.5 * (tk_r + tk_rm
                    - C_CEN4_TS * (0.5 * (de_rp + de_r)
                                   - 0.5 * (de_r + de_rm))) * fv

    div3 = pmn * (fx[:, :, 1:] - fx[:, :, :-1]
                  + fe[:, 1:, :] - fe[:, :-1, :])
    tc3 = tkw[:, rows_o, cols_o]
    if mode == "pred":
        hz_pre3 = hza_ref[:] + hzb_ref[:]
    else:
        hz_pre3 = hza_ref[:]
    rhs3 = (hz_pre3 * (c_tk * tc3 + c_sec * tsec_ref[0])
            - dtau * div3)
    tcen = [tc3[k] for k in range(nz)]
    rhs = [rhs3[k] for k in range(nz)]

    # ---- SPLINE_TS vertical advective flux ------------------------------
    # (reference: compute_vert_tracer_fluxes.h:37-71; port of
    #  roms_tpu.ops.advection._spline_interfaces)
    if "vert" not in _SKIP:
        cf_l = [jnp.ones_like(tcen[0])]
        fc_l = [2.0 * tcen[0]]
        for k in range(nz - 1):
            cff = 1.0 / (2.0 * hz_spl[k] + hz_spl[k + 1] * (2.0 - cf_l[k]))
            cf_l.append(cff * hz_spl[k])
            fc_l.append(cff * (3.0 * (hz_spl[k] * tcen[k + 1]
                                      + hz_spl[k + 1] * tcen[k])
                               - hz_spl[k + 1] * fc_l[k]))
        fc_top = (2.0 * tcen[nz - 1] - fc_l[nz - 1]) / (1.0 - cf_l[nz - 1])
        iface = [None] * (nz + 1)
        iface[nz] = fc_top
        acc = fc_top
        for k in range(nz - 1, -1, -1):
            acc = fc_l[k] - cf_l[k] * acc
            iface[k] = acc
        for k in range(nz):
            lo = 0.0 if k == 0 else iface[k] * we_ref[k]
            hi = 0.0 if k == nz - 1 else iface[k + 1] * we_ref[k + 1]
            rhs[k] = rhs[k] - dtau * pmn * (hi - lo)

    if surface:
        rhs[nz - 1] = rhs[nz - 1] + dtau * stflx_ref[0]

    # ---- implicit vertical diffusion + advection tridiagonal ------------
    # (port of roms_tpu.ops.vmix.tracer_implicit; reference:
    #  pre_step3d4S.F:216-263 / step3d_t_ISO.F:1044-1100)
    dc0 = dtau * pmn
    if "vert" not in _SKIP:
        fcv = [2.0 * dtau * akt_ref[0, j + 1] / (hz_imp[j + 1] + hz_imp[j])
               for j in range(nz - 1)]
        wcv = [dc0 * wi_ref[j + 1] for j in range(nz - 1)]
        wc_p = [jnp.maximum(w, 0.0) for w in wcv]
        wc_m = [jnp.minimum(w, 0.0) for w in wcv]

        cf_s = [None] * (nz - 1)
        dc_s = [None] * (nz - 1)
        for c in range(nz - 1):
            if c == 0:
                below = 0.0
                extra = 0.0
            else:
                below = (fcv[c - 1] - wc_m[c - 1]
                         - cf_s[c - 1] * (fcv[c - 1] + wc_p[c - 1]))
                extra = dc_s[c - 1] * (fcv[c - 1] + wc_p[c - 1])
            cff = 1.0 / (hz_imp[c] + fcv[c] + wc_p[c] + below)
            cf_s[c] = cff * (fcv[c] - wc_m[c])
            dc_s[c] = cff * (rhs[c] + extra)

    # ---- fused t3dmix lateral diffusion (reference: t3dmix_S.F:45-99) ---
    # The diffusive fluxes are built from the SAME t_half window `tkw`
    # (nrhs = n+1/2) — not from the solved t_new — so the tendency has no
    # cross-column dependency on this kernel's output and fuses for free:
    # it is simply added to each solved level on the way out, saving the
    # separate read-modify-write pass over the (nt, nz, jy, ix) state
    # that the jnp epilogue cost (~19 ms at the production bench size).
    tend = None
    if mix:
        d2w = jnp.concatenate([d2a_ref[0], d2b_ref[0]],
                              axis=-2)[:bj + 4, :]
        hzm = jnp.concatenate([hzma_ref[:], hzmb_ref[:]],
                              axis=-2)[:, :bj + 4, :]
        pu = jnp.concatenate([pua_ref[:], pub_ref[:]], axis=-2)[:bj + 4, :]
        pv = jnp.concatenate([pva_ref[:], pvb_ref[:]], axis=-2)[:bj + 4, :]

        def shm(a, dj=0, di=0):
            if dj != 0 and di != 0:
                return jnp.roll(a, shift=(-dj, -di), axis=(-2, -1))
            if dj != 0:
                return jnp.roll(a, shift=-dj, axis=-2)
            return jnp.roll(a, shift=-di, axis=-1)

        fxm = (0.25 * (d2w + shm(d2w, 0, -1))[None] * pu[None]
               * (hzm + shm(hzm, 0, -1)) * (tkw - shm(tkw, 0, -1)))
        fem = (0.25 * (d2w + shm(d2w, -1, 0))[None] * pv[None]
               * (hzm + shm(hzm, -1, 0)) * (tkw - shm(tkw, -1, 0)))
        if cfg.masking:
            fxm = fxm * um[None]
            fem = fem * vm[None]
        divm = shm(fxm, 0, 1) - fxm + shm(fem, 1, 0) - fem
        tend3 = (dtau * pmn[None] * divm[:, rows_o, cols_o] / hz_spl3)
        tend = [tend3[k] for k in range(nz)]

    mask = rmask_ref[:] if (apply_mask and cfg.masking) else None
    if "vert" in _SKIP:       # dev ablation: no implicit solve, plain /hz
        o = jnp.stack(rhs) / hz_imp3
        if mask is not None:
            o = o * mask[None]
        out_ref[0] = (o + tend3) if mix else o
        return
    t_top = ((rhs[nz - 1] + dc_s[nz - 2] * (fcv[nz - 2] + wc_p[nz - 2]))
             / (hz_imp[nz - 1] + fcv[nz - 2] - wc_m[nz - 2]
                - cf_s[nz - 2] * (fcv[nz - 2] + wc_p[nz - 2])))
    if mask is not None:
        t_top = t_top * mask
    out_ref[0, nz - 1] = (t_top + tend[nz - 1]) if mix else t_top
    t_above = t_top
    for c in range(nz - 2, -1, -1):
        t_c = dc_s[c] + cf_s[c] * t_above
        if mask is not None:
            t_c = t_c * mask
        out_ref[0, c] = (t_c + tend[c]) if mix else t_c
        t_above = t_c


def tracer_stage(tk, t_sec, flx_u, flx_v, hz_a, hz_b, we, wi, akt,
                 pmn, rmask, umask, vmask, cfg: ModelConfig,
                 scheme: AdvScheme, dtau: float, c_tk: float, c_sec: float,
                 apply_mask: bool, mode: str, stflx=None, mix=None,
                 own=None):
    """Fused tracer stage over all tracers -> t_new (nt, nz, jy, ix).

    mode='pred':  hz_a=Hz(n), hz_b=flx_div  (Hz_bak/Hz_fwd derived);
    mode='corr':  hz_a=Hz(n), hz_b=Hz(n+1).
    akt: the RAW mixing table (n_akt, nz+1, jy, ix); tracer i uses row
    min(i, i_t_and_s-1) (reference: src/tracers.F iTandS clamp) via the
    block index map — no nt-sized gather is materialized.
    mix (corr mode only): fused t3dmix inputs — a dict with
    diff2 (nt, jy, ix), pmon_u, pnom_v (2D); the diffusive tendency from
    the t_half window is added to the solved tracers in-kernel
    (reference: t3dmix_S.F, called right after the corrector in main.F).
    own: (own_w, own_e, own_s, own_n) physical-edge ownership flags for
    shard_map blocks (traced booleans from dist._with_ownership); None =
    single block, which owns every edge.
    """
    nt, nz, jy, ix = tk.shape
    dtype = tk.dtype
    surface = stflx is not None
    assert mix is None or mode == "corr"

    jy_p = -(-jy // BJ) * BJ
    nj = jy_p // BJ

    # Row padding policy: the ONLY arrays padded host-side are the four
    # whose values cross rows inside the stencil (tk window, masks, fv) —
    # one fused wrap-pad each, sized so the shifted r+1 block view stays
    # meaningful.  Every pointwise-consumed field (hz, we, wi, akt, t_sec,
    # pmn, rmask, stflx) is passed UNPADDED: the tail block's
    # out-of-bounds reads land only in output rows >= jy, which the
    # pipeline's out-of-bounds write handling discards — saving a full
    # read+write pass per field per stage (the profiler showed these pad
    # copies costing more than the kernel's own compute).
    rows_w = (nj + 1) * BJ
    wrap_w = lambda a: jnp.pad(
        a, [(0, 0)] * (a.ndim - 2) + [(2, rows_w - jy - 2), (2, 2)],
        mode="wrap")

    if cfg.masking:
        um_w = wrap_w(umask)
        vm_w = wrap_w(vmask)
    else:
        um_w = vm_w = jnp.ones((rows_w, ix + 4), dtype)
    tk_w = wrap_w(tk)
    # flx_u needs only the wrap column beyond the east edge
    fu_w = jnp.pad(flx_u, [(0, 0), (0, 0), (0, 1)], mode="wrap")
    # fv needs one wrap row beyond each output row (fe divergence)
    fv_w = jnp.pad(flx_v, [(0, 0), (0, rows_w - jy), (0, 0)], mode="wrap")

    rpad = lambda a: jnp.pad(
        a, [(0, 0)] * (a.ndim - 2) + [(0, jy_p - jy), (0, 0)],
        mode="edge") if jy_p != jy else a
    hz_b_raw = hz_b                      # pre-rpad (wrap_w needs true rows)
    t_sec = rpad(t_sec); hz_a = rpad(hz_a); hz_b = rpad(hz_b)
    we = rpad(we); wi = rpad(wi); akt = rpad(akt)
    pmn = rpad(pmn); rmask = rpad(rmask)
    if stflx is None:
        stflx_in = jnp.zeros((nt, BJ, ix), dtype)
        st_spec = pl.BlockSpec((1, BJ, ix), lambda r, t: (t, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        stflx_in = rpad(stflx)
        st_spec = pl.BlockSpec((1, BJ, ix), lambda r, t: (t, r, 0),
                               memory_space=pltpu.VMEM)

    if own is None:
        own_in = jnp.ones((1, 4), jnp.float32)
    else:
        own_in = jnp.stack(
            [jnp.asarray(f, jnp.float32) if f is not None
             else jnp.float32(1.0) for f in own]).reshape(1, 4)
    own_spec = pl.BlockSpec((1, 4), lambda r, t: (0, 0),
                            memory_space=pltpu.SMEM)

    imix = max(cfg.i_t_and_s, 1)

    jm = lambda r, t: (0, r, 0)
    jm1 = lambda r, t: (0, r + 1, 0)
    jtm = lambda r, t: (t, 0, r, 0)
    jtm1 = lambda r, t: (t, 0, r + 1, 0)
    jm2d = lambda r, t: (r, 0)
    jm2d1 = lambda r, t: (r + 1, 0)
    jtm_2d3 = lambda r, t: (t, r, 0)      # (nt, rows, cols) leaves
    jtm1_2d3 = lambda r, t: (t, r + 1, 0)
    jm3w = jm
    jm3w1 = jm1

    mix_inputs = []
    mix_specs = []
    if mix is not None:
        # wrap-padded double views for the diffusion stencil (reach 1 in
        # each direction; hz_b re-passed wrapped because its plain form
        # above is row-unpadded); all are t-independent except diff2, so
        # the pipeline fetches them once per row block
        d2_w = wrap_w(mix["diff2"])
        hzm_w = wrap_w(hz_b_raw)
        pu_w = wrap_w(mix["pmon_u"])
        pv_w = wrap_w(mix["pnom_v"])
        mix_inputs = [d2_w, d2_w, hzm_w, hzm_w, pu_w, pu_w, pv_w, pv_w]
        mix_specs = [
            pl.BlockSpec((1, BJ, ix + 4), jtm_2d3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BJ, ix + 4), jtm1_2d3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nz, BJ, ix + 4), jm3w, memory_space=pltpu.VMEM),
            pl.BlockSpec((nz, BJ, ix + 4), jm3w1, memory_space=pltpu.VMEM),
            pl.BlockSpec((BJ, ix + 4), jm2d, memory_space=pltpu.VMEM),
            pl.BlockSpec((BJ, ix + 4), jm2d1, memory_space=pltpu.VMEM),
            pl.BlockSpec((BJ, ix + 4), jm2d, memory_space=pltpu.VMEM),
            pl.BlockSpec((BJ, ix + 4), jm2d1, memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(
        _kernel, cfg=cfg, scheme=scheme, dtau=float(dtau),
        c_tk=float(c_tk), c_sec=float(c_sec), apply_mask=apply_mask,
        surface=surface, mode=mode, ix=ix, nz=nz, jy=jy,
        mix=mix is not None)

    try:
        comp = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
    except AttributeError:   # older spelling
        comp = pltpu.TPUCompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    vspec = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(nj, nt),
        in_specs=[
            pl.BlockSpec((1, nz, BJ, ix + 4), jtm, memory_space=vspec),
            pl.BlockSpec((1, nz, BJ, ix + 4), jtm1, memory_space=vspec),
            pl.BlockSpec((nz, BJ, ix + 1), jm, memory_space=vspec),
            pl.BlockSpec((nz, BJ, ix), jm, memory_space=vspec),
            pl.BlockSpec((nz, BJ, ix), jm1, memory_space=vspec),
            pl.BlockSpec((BJ, ix + 4), jm2d, memory_space=vspec),
            pl.BlockSpec((BJ, ix + 4), jm2d1, memory_space=vspec),
            pl.BlockSpec((BJ, ix + 4), jm2d, memory_space=vspec),
            pl.BlockSpec((BJ, ix + 4), jm2d1, memory_space=vspec),
            pl.BlockSpec((1, nz, BJ, ix), jtm, memory_space=vspec),
            pl.BlockSpec((nz, BJ, ix), jm, memory_space=vspec),
            pl.BlockSpec((nz, BJ, ix), jm, memory_space=vspec),
            pl.BlockSpec((nz + 1, BJ, ix), jm, memory_space=vspec),
            pl.BlockSpec((nz + 1, BJ, ix), jm, memory_space=vspec),
            pl.BlockSpec((1, nz + 1, BJ, ix),
                         lambda r, t: (jnp.minimum(t, imix - 1), 0, r, 0),
                         memory_space=vspec),
            pl.BlockSpec((BJ, ix), lambda r, t: (r, 0),
                         memory_space=vspec),
            pl.BlockSpec((BJ, ix), lambda r, t: (r, 0),
                         memory_space=vspec),
            st_spec,
            own_spec,
        ] + mix_specs,
        out_specs=pl.BlockSpec((1, nz, BJ, ix), jtm,
                               memory_space=vspec),
        out_shape=jax.ShapeDtypeStruct((nt, nz, jy_p, ix), dtype),
        compiler_params=comp,
        interpret=_INTERPRET,
    )(tk_w, tk_w, fu_w, fv_w, fv_w, um_w, um_w, vm_w, vm_w,
      t_sec, hz_a, hz_b, we, wi, akt, pmn, rmask, stflx_in, own_in,
      *mix_inputs)
    if jy_p != jy:
        out = out[:, :, :jy, :]
    return out
