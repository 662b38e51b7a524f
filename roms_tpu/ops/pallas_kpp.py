"""Fused Pallas TPU kernel for the full vertical-mixing update
(lmd_vmix interior coefficients + lmd_kpp boundary layers).

The jnp KPP path showed a 58x HBM traffic amplification (ROOFLINE.md:
15.6 ms, 10.5 GB moved vs a 0.18 GB hand-counted floor at 384x192x60):
XLA materializes every stencil intermediate — the per-level Ri smoother,
the bulk Richardson kernel, the wscale branches, the take_along_axis
gathers — as full (nz, jy, ix) HBM arrays.  This kernel runs the whole
update (reference: src/lmd_vmix.F:150-404 interior + src/lmd_kpp.F:153-651
surface/bottom boundary layers) in one pass over memory: one row-block
grid, whole columns resident in VMEM, every intermediate on-chip.

Physics transcribed 1:1 from `roms_tpu.ops.kpp` (the f64 oracle path,
which itself matches the reference's frozen series):

  * interior: shear Ri + SMOOTH_RIG isotropic smoother + LMD_CONVEC,
    bottom turbulence suppression, ascending in-place vertical smoothing
    (lmd_vmix.F:396-404 reproduced as an unrolled sequential loop);
  * KPP: INT_AT_RHO_POINTS bulk Ri integral, surface/bottom layer depth
    searches (unrolled level loops replace the take_along_axis gathers),
    SMOOTH_HBL, the 0.5 time filter, wscale stability functions, shape
    profiles and nonlocal ghat.

Pipelining follows `pallas_tracer`: each field is passed as two row-block
views shifted by one block of a wrap-padded array; the kernel
concatenates them and slices the (BJ+6)-row stencil window (the
smoothers reach +-2 rows, the staggered v/svstr averages one more).
Wrap-padding reproduces the jnp path's roll semantics bitwise, so even
ghost rows agree; the two _fill_phys_edges_2d row fills are applied with
window-relative rolls gated on the global row index, the column fills
with broadcast source columns gated on the global column index (both
wrap-aware, so the padded copies of filled rows/cols match too).

Scope: single-block stepping, pad_e == pad_n == 0 (`usable`); the
distributed path and the f64 CPU oracle keep the jnp engine.  The final
hbls/hbbl edge fill (VmixOut contract) runs as a cheap 2D jnp epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roms_tpu.config import ModelConfig
from roms_tpu.ops import kpp
from roms_tpu.ops.kpp import (A_M, A_S, BETAT, C_EK, C_M, C_S, CSTAR, CV,
                              EPS_KPP, EPSSFC, LTURB, NU0C, NU0M, NU0S,
                              NUWM, NUWS, RI0, RI_INV, RICR, VmixOut,
                              ZETA_M, ZETA_S)
from roms_tpu.ops.pallas_tracer import _INTERPRET

# j-rows per block.  Larger than the tracer engine's BJ=8: this kernel is
# VPU-compute-bound (~150 ops/point) and the (BJ+6)-row stencil window
# makes the redundant-halo compute fraction 6/BJ — BJ=16 cuts it from
# 75% to 37% extra at a VMEM footprint that still double-buffers under
# the 128 MB limit.
BJ = int(__import__("os").environ.get("ROMS_TPU_PALLAS_KPP_BJ", "16"))

# rows of the stencil window: BJ output rows + 2 halo rows below + 2 above
# (smoother reach) + 2 more above (staggered v/svstr average feeding the
# halo-row columns)
WIN = BJ + 6

# indices into the stacked 2D-field input (see vmix_update)
(F2_TSURF_T, F2_TSURF_S, F2_STFLX_T, F2_STFLX_S, F2_SRFLX, F2_SUSTR,
 F2_SVSTR, F2_F, F2_RMASK, F2_UMASK, F2_VMASK, F2_HBLS, F2_HBBL) = range(13)


def usable(cfg: ModelConfig) -> bool:
    """Whether the fused kernel covers this configuration's vmix update."""
    return cfg.lmd_kpp and cfg.pad_e == 0 and cfg.pad_n == 0


def _sh(a, dj: int = 0, di: int = 0):
    """Window shift with roll semantics: result[.., j, i] = a[.., j+dj, i+di]
    (valid wherever the read stays inside the window; garbage wrap values
    stay outside the rows/cols consumed downstream)."""
    if dj != 0 and di != 0:
        return jnp.roll(a, shift=(-dj, -di), axis=(-2, -1))
    if dj != 0:
        return jnp.roll(a, shift=-dj, axis=-2)
    if di != 0:
        return jnp.roll(a, shift=-di, axis=-1)
    return a


def _fill_edges(a, row_g, col_m, jy: int, ix: int, cfg: ModelConfig, own):
    """Window form of kpp._fill_phys_edges_2d (zero-gradient copy into the
    physical-edge ghost lines, depth 2; reference: lmd_kpp.F:545-581).

    row_g: global row index of each window row (may exceed jy on wrap
    rows — conditions test modulo jy so the wrapped copies of filled rows
    match the jnp path's roll of the globally filled array).
    col_m: global column index modulo ix for each window column.
    own: (own_w, own_e, own_s, own_n) scalar bools — physical-edge
    ownership of this block (all-true single-block; per-shard flags under
    shard_map, reference: lmd_kpp.F:545-581 per-rank edge tests).
    """
    own_w, own_e, own_s, own_n = own
    if not cfg.ew_periodic:
        # west cols 0,1 <- col 2; east cols ix-2, ix-1 <- col ix-3.
        # Window col of global 2 is 4; of ix-3 is ix-1 (static offsets:
        # the window's column origin is fixed at -2).
        west = a[..., :, 4:5]
        east = a[..., :, ix - 1:ix]
        a = jnp.where(((col_m == 0) | (col_m == 1)) & own_w, west, a)
        a = jnp.where(((col_m == ix - 2) | (col_m == ix - 1)) & own_e,
                      east, a)
    if not cfg.ns_periodic:
        rm = row_g % jy
        # south rows 0,1 <- row 2 (window-relative +2/+1 rolls; targets
        # sit >= 2 rows below the window top, so the roll never wraps
        # into garbage at a consumed position)
        a = jnp.where((rm == 1) & own_s, _sh(a, 1), a)
        a = jnp.where((rm == 0) & own_s, _sh(a, 2), a)
        # north rows jy-2, jy-1 <- row jy-3 (never appear as wrap rows)
        a = jnp.where((rm == jy - 2) & own_n, _sh(a, -1), a)
        a = jnp.where((rm == jy - 1) & own_n, _sh(a, -2), a)
    return a


def _smooth(a, um, vm, rmask, cfg: ModelConfig, apply_rmask: bool):
    """kpp._smooth2d on the window (isotropic Laplacian, cff=1/12,
    cff1=3/16; reference: src/lmd_kpp_smooth_hbl.h).  Valid on rows
    2..WIN-3 given filled input rows 0..WIN-1."""
    cff, cff1 = 1.0 / 12.0, 3.0 / 16.0
    fx = a - _sh(a, 0, -1)
    fe1 = a - _sh(a, -1, 0)
    if cfg.masking:
        fx = fx * um
        fe1 = fe1 * vm
    fe = fe1 + cff * (_sh(fx, 0, 1) + _sh(fx, -1, 0) - fx - _sh(fx, -1, 1))
    fx2 = fx + cff * (_sh(fe1, 1, 0) + _sh(fe1, 0, -1) - fe1 - _sh(fe1, 1, -1))
    out = a + cff1 * (_sh(fx2, 0, 1) - fx2 + _sh(fe, 1, 0) - fe)
    if apply_rmask and cfg.masking:
        out = out * rmask
    return out


def _cbrt(x):
    """Mosaic-safe cube root: sign(x) * exp(log|x| / 3) (jnp.cbrt has no
    Pallas TPU lowering).  exp(log(0)/3) = exp(-inf) = 0, so the x = 0
    case is exact; elsewhere the exp/log form differs from a true cbrt by
    a few ulp — irrelevant against the O(10%) model error of the KPP
    parametrization.  Interpret mode (the CPU equivalence tests) uses the
    true jnp.cbrt so the kernel matches the jnp path to round-off."""
    if _INTERPRET:
        return jnp.cbrt(x)
    return jnp.sign(x) * jnp.exp(jnp.log(jnp.abs(x)) * (1.0 / 3.0))


def _sel(values, idx, krange):
    """values[k] gathered at idx (2D int field): one-hot select over the
    unrolled level loop — replaces jnp.take_along_axis, which has no
    efficient Mosaic lowering."""
    acc = jnp.zeros_like(values[krange[0]])
    for k in krange:
        acc = jnp.where(idx == k, values[k], acc)
    return acc


def _kernel(ua_ref, ub_ref, va_ref, vb_ref, bvfa_ref, bvfb_ref,
            zra_ref, zrb_ref, zwa_ref, zwb_ref, hza_ref, hzb_ref,
            swrfa_ref, swrfb_ref, f2a_ref, f2b_ref, own_ref,
            akv_ref, akt_t_ref, akt_s_ref, ghat_ref, hbl2_ref,
            *, cfg: ModelConfig, first_step: bool, jy: int, ix: int,
            nz: int):
    own = (own_ref[0, 0] > 0.5, own_ref[0, 1] > 0.5,
           own_ref[0, 2] > 0.5, own_ref[0, 3] > 0.5)
    r = pl.program_id(0)
    r0 = r * BJ

    def win(a_ref, b_ref):
        return jnp.concatenate([a_ref[:], b_ref[:]], axis=-2)[..., :WIN, :]

    u = win(ua_ref, ub_ref)
    v = win(va_ref, vb_ref)
    bvf = win(bvfa_ref, bvfb_ref)
    z_r = win(zra_ref, zrb_ref)
    z_w = win(zwa_ref, zwb_ref)
    hz = win(hza_ref, hzb_ref)
    swrf = win(swrfa_ref, swrfb_ref)
    f2 = win(f2a_ref, f2b_ref)

    row_g = (jax.lax.broadcasted_iota(jnp.int32, (WIN, ix + 5), 0)
             + (r0 - 2))
    col_m = (jax.lax.broadcasted_iota(jnp.int32, (WIN, ix + 5), 1)
             + (ix - 2)) % ix

    srflx = f2[F2_SRFLX]
    sustr, svstr = f2[F2_SUSTR], f2[F2_SVSTR]
    fcor = f2[F2_F]
    rmask, umask, vmask = f2[F2_RMASK], f2[F2_UMASK], f2[F2_VMASK]
    hbls_old, hbbl_old = f2[F2_HBLS], f2[F2_HBBL]

    # ---- alfabeta at the surface (reference: src/alfabeta.F) ------------
    t_surf = jnp.stack([f2[F2_TSURF_T], f2[F2_TSURF_S]], axis=0)
    alpha, beta = kpp.alfabeta(t_surf, cfg)

    g = cfg.g
    stflx_t, stflx_s = f2[F2_STFLX_T], f2[F2_STFLX_S]
    Bo = g * (alpha * (stflx_t - srflx))
    if cfg.salinity:
        Bo = Bo - g * beta * stflx_s
    Bosol = g * alpha * srflx

    ustar = jnp.sqrt(jnp.sqrt((1.0 / 3.0) * (
        sustr ** 2 + _sh(sustr, 0, 1) ** 2 + sustr * _sh(sustr, 0, 1)
        + svstr ** 2 + _sh(svstr, 1, 0) ** 2 + svstr * _sh(svstr, 1, 0))))

    hbl = hbls_old
    bbl = hbbl_old

    # =====================================================================
    # interior mixing (reference: lmd_vmix.F:150-404)
    # =====================================================================
    dz_w = z_r[1:] - z_r[:-1]
    cffz = 0.5 / dz_w
    shu = _sh(u, 0, 1)
    shv = _sh(v, 1, 0)
    dudz = cffz * (u[1:] - u[:-1] + shu[1:] - shu[:-1])
    dvdz = cffz * (v[1:] - v[:-1] + shv[1:] - shv[:-1])
    rig = bvf[1:nz] / (RI0 * jnp.maximum(dudz ** 2 + dvdz ** 2, 1.0e-10))

    rig = _fill_edges(rig, row_g, col_m, jy, ix, cfg, own)
    cffs, cff1 = 1.0 / 12.0, 3.0 / 16.0
    fx = rig - _sh(rig, 0, -1)
    fe1 = rig - _sh(rig, -1, 0)
    if cfg.masking:
        fx = fx * umask[None]
        fe1 = fe1 * vmask[None]
    fe = fe1 + cffs * (_sh(fx, 0, 1) + _sh(fx, -1, 0) - fx - _sh(fx, -1, 1))
    fx2 = fx + cffs * (_sh(fe1, 1, 0) + _sh(fe1, 0, -1)
                       - fe1 - _sh(fe1, 1, -1))
    rig = rig + cff1 * (_sh(fx2, 0, 1) - fx2 + _sh(fe, 1, 0) - fe)

    cffr = jnp.minimum(1.0, jnp.maximum(0.0, rig))
    nu_sx = (1.0 - cffr * cffr) ** 3
    kv3 = NUWM + NU0M * nu_sx
    kt3 = NUWS + NU0S * nu_sx
    kv3 = jnp.where(rig < 0.0, kv3 + NU0C, kv3)
    kt3 = jnp.where(rig < 0.0, kt3 + NU0C, kt3)

    dist = z_w[1:nz] - z_w[0][None]
    mult = jnp.where(dist < LTURB, jnp.sin(0.5 * jnp.pi * dist / LTURB), 1.0)
    kv3 = kv3 * mult
    kt3 = kt3 * mult

    # ascending in-place vertical smoothing + background, unrolled
    # (reference: lmd_vmix.F:396-404; level k reads the smoothed k-1)
    def pad_smooth(kk3, bak):
        lev = [kk3[k] for k in range(nz - 1)]
        top = lev[-1] + bak
        bot = lev[0] + bak
        full = [bot] + lev + [top]
        out = [bot]
        prev = full[0]
        for k in range(1, nz):
            sm = 0.5 * full[k] + 0.25 * prev + 0.25 * full[k + 1] + bak
            out.append(sm)
            prev = sm
        out.append(top)
        return out                                     # nz+1 levels

    kv = pad_smooth(kv3, cfg.akv_bak)
    # ks == kt identically here: without double diffusion the jnp path's
    # ks is an alias of kt through interior_mix AND every lmd_kpp profile
    # formula applied to it is the same expression — compute once, emit
    # twice (reference: lmd_kpp.F treats Akt/Aks separately only under
    # LMD_DDMIX, which neither path implements)
    kt = pad_smooth(kt3, cfg.akt_bak)

    # =====================================================================
    # KPP boundary layers (reference: lmd_kpp.F:153-651)
    # =====================================================================
    # bulk Richardson integral FC (INT_AT_RHO_POINTS, lmd_kpp.F:202-236)
    u_r = 0.5 * (u + shu)
    v_r = 0.5 * (v + shv)
    du2 = (2 * (u_r[1:] - u_r[:-1])) ** 2 + (2 * (v_r[1:] - v_r[:-1])) ** 2
    hz2 = hz[1:] + hz[:-1]
    cff_up = (z_w[nz][None] - z_w[1:nz]) ** 2
    cff_dn = (z_w[1:nz] - z_w[0][None]) ** 2
    kern = cff_up * cff_dn / ((cff_up + (EPSSFC * hbl[None]) ** 2)
                              * (cff_dn + (EPSSFC * bbl[None]) ** 2))
    incr = kern * (0.5 * du2 / hz2
                   - 0.5 * hz2 * (RI_INV * bvf[1:nz]
                                  + C_EK * (fcor ** 2)[None]))

    fcl = [None] * (nz + 1)                       # FC at W-levels 0..nz
    fcl[nz] = jnp.zeros_like(incr[0])
    acc = fcl[nz]
    for k in range(nz - 1, 0, -1):
        acc = acc + incr[k - 1]
        fcl[k] = acc

    z_bl0 = z_w[0] + 0.25 * hz[0]
    cu0 = (z_w[nz] - z_bl0) ** 2
    cd0 = (z_bl0 - z_w[0]) ** 2
    kern0 = cu0 * cd0 / ((cu0 + (EPSSFC * hbl) ** 2)
                         * (cd0 + (EPSSFC * bbl) ** 2))
    fc0 = fcl[1] + kern0 * (
        0.5 * ((2 * u_r[0]) ** 2 + (2 * v_r[0]) ** 2) / hz[0]
        - 0.5 * hz[0] * (RI_INV * bvf[1] + C_EK * fcor ** 2))
    fcl[0] = fc0

    # ---- surface boundary layer depth (lmd_kpp.F:238-275) ---------------
    cg = CSTAR * cfg.von_karman * (C_S * cfg.von_karman * EPSSFC) ** (1.0 / 3.0)
    vtc = CV * jnp.sqrt(-BETAT / (C_S * EPSSFC)) / (RICR * cfg.von_karman ** 2)

    swdk_r = jnp.sqrt(swrf[1:] * swrf[:-1])
    zscale_r = z_w[nz][None] - z_r
    bfsfc_r = Bo[None] + Bosol[None] * (1.0 - swdk_r)
    ws_r = kpp._wscale_ws(zscale_r, bfsfc_r, ustar[None], hbl[None],
                          rmask[None], cfg, cbrt=_cbrt)
    vtsq = 1.8 * vtc * ws_r * jnp.sqrt(jnp.maximum(1.0e-5, bvf[0:nz]))

    crl = [None] * (nz + 1)                       # Cr at levels 1..nz
    for k in range(1, nz + 1):
        crl[k] = fcl[k] + vtsq[k - 1]

    kbls = jnp.zeros_like(row_g)                  # largest k with Cr<0
    for k in range(1, nz + 1):
        kbls = jnp.where(crl[k] < 0.0, k, kbls)
    kb = jnp.clip(kbls, 1, nz)
    kb1 = jnp.clip(kb, 1, nz - 1) + 1
    zrl = [z_r[k] for k in range(nz)]
    cr_k = _sel(crl, kb, range(1, nz + 1))
    cr_k1 = _sel(crl, kb1, range(2, nz + 1))
    zr_k = _sel(zrl, kb - 1, range(0, nz))
    zr_k1 = _sel(zrl, jnp.clip(kb, 1, nz - 1), range(1, nz))
    hbl_int = z_w[nz] - (zr_k * cr_k1 - zr_k1 * cr_k) / (cr_k1 - cr_k)
    hbl_top = z_w[nz] - z_r[nz - 1]
    hbl_new = jnp.where(kbls == 0, z_w[nz] - z_w[0],
                        jnp.where(kbls == nz, hbl_top, hbl_int))
    if cfg.masking:
        hbl_new = hbl_new * rmask

    # ---- bottom boundary layer depth (lmd_kpp.F:277-302) ----------------
    crbl = [None] * (nz + 1)
    for k in range(1, nz + 1):
        crbl[k] = fcl[k] - fc0
    big = nz + 1
    kbbl = jnp.full_like(row_g, big)              # smallest k with Cr>0
    for k in range(nz, 0, -1):
        kbbl = jnp.where(crbl[k] > 0.0, k, kbbl)
    kbb = jnp.clip(kbbl, 2, nz)
    crb_k = _sel(crbl, kbb, range(2, nz + 1))
    crb_km1 = _sel(crbl, kbb - 1, range(1, nz))
    zr_km1 = _sel(zrl, kbb - 2, range(0, nz - 1))
    zr_kk = _sel(zrl, kbb - 1, range(1, nz))
    bbl_int = (zr_km1 * crb_k - zr_kk * crb_km1) / (crb_k - crb_km1) - z_w[0]
    bbl_new = jnp.where(kbbl == big, z_w[nz] - z_w[0],
                        jnp.where(kbbl == 1, z_r[0] - z_w[0], bbl_int))
    if cfg.masking:
        bbl_new = bbl_new * rmask

    # ---- SMOOTH_HBL + time filter (lmd_kpp.F:312-349) -------------------
    hbl_new = _smooth(_fill_edges(hbl_new, row_g, col_m, jy, ix, cfg, own),
                      umask, vmask, rmask, cfg, apply_rmask=True)
    bbl_new = _smooth(_fill_edges(bbl_new, row_g, col_m, jy, ix, cfg, own),
                      umask, vmask, rmask, cfg, apply_rmask=True)
    if not first_step:
        hbl_new = 0.5 * (hbl_new + hbls_old)
        bbl_new = 0.5 * (bbl_new + hbbl_old)

    # ---- everything below is pointwise: restrict to the output block ----
    o2 = (slice(2, 2 + BJ), slice(2, ix + 2))
    o3 = (slice(None),) + o2
    hbl_o = hbl_new[o2]
    bbl_o = bbl_new[o2]
    z_w_o, z_r_o, hz_o, swrf_o = z_w[o3], z_r[o3], hz[o3], swrf[o3]
    Bo_o, Bosol_o, ustar_o, rmask_o = Bo[o2], Bosol[o2], ustar[o2], rmask[o2]
    kv_o = [a[o2] for a in kv]
    kt_o = [a[o2] for a in kt]

    # ---- surface-layer shape profile (lmd_kpp.F:361-449) ----------------
    z_bl = z_w_o[nz] - hbl_o
    kbls2 = jnp.full_like(hbl_o, nz, dtype=jnp.int32)
    for k in range(nz - 1, 0, -1):                # smallest k with z_w>z_bl
        kbls2 = jnp.where(z_w_o[k] > z_bl, k, kbls2)

    swl = [swrf_o[k] for k in range(nz + 1)]
    zwl = [z_w_o[k] for k in range(nz + 1)]
    swk = _sel(swl, kbls2, range(1, nz + 1))
    swkm1 = _sel(swl, kbls2 - 1, range(0, nz))
    zwk = _sel(zwl, kbls2, range(1, nz + 1))
    zwkm1 = _sel(zwl, kbls2 - 1, range(0, nz))
    bfs_interp = Bo_o + Bosol_o * (1.0 - swkm1 * swk * (zwk - zwkm1)
                                   / (swk * (zwk - z_bl)
                                      + swkm1 * (z_bl - zwkm1)))
    bfsfc_bl = jnp.where(swkm1 > 0.0, bfs_interp, Bo_o + Bosol_o)

    zscale_w = z_w_o[nz][None] - z_w_o
    wm_w, ws_w = kpp._wscale_wm_ws(zscale_w, bfsfc_bl[None], ustar_o[None],
                                   hbl_o[None], rmask_o[None], cfg,
                                   cbrt=_cbrt)
    ssgm = (z_w_o[nz][None] - z_w_o) / jnp.maximum(hbl_o, EPS_KPP)[None]
    cff_bl = jnp.where(ssgm < 0.07, 0.5 * (ssgm - 0.07) ** 2 / 0.07, 0.0)
    cff_bl = cff_bl + ssgm * (1.0 - ssgm) ** 2
    amp = ssgm ** 2
    in_bl = ssgm < 1.0

    kv3o = jnp.stack(kv_o, axis=0)
    kt3o = jnp.stack(kt_o, axis=0)
    kv_new = jnp.where(
        in_bl, jnp.sqrt((amp * kv3o) ** 2
                        + (wm_w * hbl_o[None] * cff_bl) ** 2), kv3o)
    kt_new = jnp.where(
        in_bl, jnp.sqrt((amp * kt3o) ** 2
                        + (ws_w * hbl_o[None] * cff_bl) ** 2), kt3o)
    ghat = jnp.where(in_bl & (bfsfc_bl[None] < 0.0),
                     -cg * ssgm * (1.0 - ssgm) ** 2, 0.0)

    # ---- bottom boundary layer profile (lmd_kpp.F:452-497) --------------
    u0, su0 = u[0][o2], shu[0][o2]
    v0, sv0 = v[0][o2], shv[0][o2]
    wmb = cfg.von_karman ** 2 * jnp.sqrt((1.0 / 3.0) * (
        u0 ** 2 + su0 ** 2 + u0 * su0 + v0 ** 2 + sv0 ** 2 + v0 * sv0
    )) / jnp.log(1.0 + 0.5 * hz_o[0] / cfg.zob)
    sgmb = (z_w_o - z_w_o[0][None] + cfg.zob) / (bbl_o[None] + cfg.zob)
    cff1b = sgmb * (1.0 - sgmb) ** 2
    in_bbl = sgmb < 1.0
    kv_new = jnp.where(in_bbl, jnp.sqrt(
        kv_new ** 2 + (wmb[None] * bbl_o[None] * cff1b) ** 2), kv_new)
    kt_new = jnp.where(in_bbl, jnp.sqrt(
        kt_new ** 2 + (wmb[None] * bbl_o[None] * cff1b) ** 2), kt_new)

    if cfg.masking:
        water = rmask_o[None] > 0.5
        kv_new = jnp.where(water, kv_new, 0.0)
        kt_new = jnp.where(water, kt_new, 0.0)

    akv_ref[:] = kv_new
    akt_t_ref[:] = kt_new
    akt_s_ref[:] = kt_new
    ghat_ref[:] = ghat
    hbl2_ref[0] = hbl_o
    hbl2_ref[1] = bbl_o


def vmix_update(state, u, v, t, bvf, z_r, z_w, hz, forcing, grid,
                cfg: ModelConfig, first_step: bool) -> VmixOut:
    """Drop-in fused replacement for stepper._vmix_update (interior_mix +
    lmd_kpp) on the single-block TPU path."""
    nz, jy, ix = u.shape
    dtype = u.dtype

    jy_p = -(-jy // BJ) * BJ
    nj = jy_p // BJ
    rows_w = (nj + 1) * BJ

    def wrap(a):
        return jnp.pad(
            a, [(0, 0)] * (a.ndim - 2) + [(2, rows_w - jy - 2), (2, 3)],
            mode="wrap")

    zero2 = jnp.zeros((jy, ix), dtype)
    ts_t = t[cfg.itemp, nz - 1]
    ts_s = t[cfg.isalt, nz - 1] if cfg.salinity else zero2
    stf_t = forcing.stflx[cfg.itemp]
    stf_s = forcing.stflx[cfg.isalt] if cfg.salinity else zero2
    ones2 = jnp.ones((jy, ix), dtype)
    f2 = jnp.stack([
        ts_t, ts_s, stf_t, stf_s, forcing.srflx, forcing.sustr,
        forcing.svstr, grid.f,
        grid.rmask if cfg.masking else ones2,
        grid.umask if cfg.masking else ones2,
        grid.vmask if cfg.masking else ones2,
        state.hbls, state.hbbl], axis=0)

    ownf = (grid.own_w, grid.own_e, grid.own_s, grid.own_n)
    own_in = jnp.stack(
        [jnp.asarray(f, jnp.float32) if f is not None else jnp.float32(1.0)
         for f in ownf]).reshape(1, 4)

    u_w, v_w, bvf_w = wrap(u), wrap(v), wrap(bvf)
    zr_w, zw_w, hz_w = wrap(z_r), wrap(z_w), wrap(hz)
    swrf_w, f2_w = wrap(state.swrf), wrap(f2)

    X = ix + 5
    jm = lambda r: (0, r, 0)
    jm1 = lambda r: (0, r + 1, 0)
    vspec = pltpu.VMEM

    def spec3(n, nxt=False):
        return pl.BlockSpec((n, BJ, X), jm1 if nxt else jm,
                            memory_space=vspec)

    kernel = functools.partial(_kernel, cfg=cfg, first_step=first_step,
                               jy=jy, ix=ix, nz=nz)
    try:
        comp = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
    except AttributeError:
        comp = pltpu.TPUCompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    out_spec3 = pl.BlockSpec((nz + 1, BJ, ix), lambda r: (0, r, 0),
                             memory_space=vspec)
    akv, akt_t, akt_s, ghat, hbl2 = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            spec3(nz), spec3(nz, True),            # u
            spec3(nz), spec3(nz, True),            # v
            spec3(nz + 1), spec3(nz + 1, True),    # bvf
            spec3(nz), spec3(nz, True),            # z_r
            spec3(nz + 1), spec3(nz + 1, True),    # z_w
            spec3(nz), spec3(nz, True),            # hz
            spec3(nz + 1), spec3(nz + 1, True),    # swrf
            spec3(13), spec3(13, True),            # stacked 2D fields
            pl.BlockSpec((1, 4), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),  # ownership flags
        ],
        out_specs=(out_spec3, out_spec3, out_spec3, out_spec3,
                   pl.BlockSpec((2, BJ, ix), lambda r: (0, r, 0),
                                memory_space=vspec)),
        out_shape=(
            jax.ShapeDtypeStruct((nz + 1, jy_p, ix), dtype),
            jax.ShapeDtypeStruct((nz + 1, jy_p, ix), dtype),
            jax.ShapeDtypeStruct((nz + 1, jy_p, ix), dtype),
            jax.ShapeDtypeStruct((nz + 1, jy_p, ix), dtype),
            jax.ShapeDtypeStruct((2, jy_p, ix), dtype),
        ),
        compiler_params=comp,
        interpret=_INTERPRET,
    )(u_w, u_w, v_w, v_w, bvf_w, bvf_w, zr_w, zr_w, zw_w, zw_w,
      hz_w, hz_w, swrf_w, swrf_w, f2_w, f2_w, own_in)

    if jy_p != jy:
        akv, akt_t, akt_s, ghat = (a[:, :jy] for a in
                                   (akv, akt_t, akt_s, ghat))
        hbl2 = hbl2[:, :jy]

    # final VmixOut contract: hbls/hbbl carry the filled ghost lines
    # (cheap 2D jnp epilogue; reference: lmd_kpp.F:545-581)
    hbls = kpp._fill_phys_edges_2d(hbl2[0], cfg, grid)
    hbbl = kpp._fill_phys_edges_2d(hbl2[1], cfg, grid)
    akt = jnp.stack([akt_t, akt_s], axis=0) if cfg.salinity else akt_t[None]
    return VmixOut(akv=akv, akt=akt, hbls=hbls, hbbl=hbbl, ghat=ghat)
