"""Simple run driver: init → step loop → diagnostics log.

Replaces the reference's roms_thread time loop (reference: main.F:55-83).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from roms_tpu.config import ModelConfig
from roms_tpu.diag import compute_diag
from roms_tpu.ops.weights import set_weights
from roms_tpu.stepper import step


def _accepts_state(fn) -> bool:
    """Does the set_forces hook take the 3-arg form f(t, base, state)?
    Decided by signature, not by a TypeError try/except — an AttributeError
    raised *inside* a 3-arg hook must propagate, not silently demote the
    call to the 2-arg form."""
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return True
    kinds = [p.kind for p in sig.parameters.values()]
    npos = sum(k in (inspect.Parameter.POSITIONAL_ONLY,
                     inspect.Parameter.POSITIONAL_OR_KEYWORD) for k in kinds)
    return npos >= 3 or inspect.Parameter.VAR_POSITIONAL in kinds


def _call_forcing_fn(fn, t, forcing, state):
    """set_forces hook: prefer the 3-arg form f(t, base, state) (bulk
    forcing needs SST, reference: bulk_frc.F uses t(:,:,N,nrhs,itemp));
    fall back to the legacy 2-arg form."""
    if _accepts_state(fn):
        return fn(t, forcing, state)
    return fn(t, forcing)


def _diag_due(iic: int, ninfo: int) -> bool:
    """Reference-style log-ramped diagnostics schedule: every step while
    spinning up (powers of two below ninfo), then every ninfo steps
    (reference: diag.F:36-41 ic ramp)."""
    if ninfo <= 1 or iic <= 1:
        return True
    if iic % ninfo == 0:
        return True
    if iic < ninfo:                      # power-of-two ramp
        return iic & (iic - 1) == 0
    return False


def run(grid, state, forcing, cfg: ModelConfig, nsteps: int | None = None,
        collect_diag: bool = True, print_diag: bool = False,
        blowup_check: bool = True, forcing_fn=None, step_hook=None,
        ninfo: int = 1, error_log=None, timers=None):
    """Advance `nsteps` baroclinic steps; return (state, diag_rows).

    diag_rows[i] = (step_index, avke, avke2b, cu_adv, cu_w) matching the
    reference log table (reference: diag.F:540-552, code_check format).

    blowup_check: NaN/Inf watchdog on the diagnostics with clean abort
    (reference: diag.F:624-634, main.F:71-73).
    forcing_fn: optional `f(time_seconds, base_forcing) -> Forcing` hook —
    the set_forces analog for time-dependent forcing (reference: main.F:385).
    step_hook: optional `f(state, step_index)` called after every step
    (output writers, particles, ...).
    ninfo: diagnostics interval (reference: roms.in ninfo); with ninfo>1
    the schedule is log-ramped (`_diag_due`) and steps between diag points
    never synchronize the host with the device — the loop just enqueues.
    error_log: optional monitor.ErrorLog; blowups are queued there (and
    still raised, reference: error_handling_mod.F90 raise_* + abort path).
    timers: optional monitor.Timers; accumulates the 'step' phase and
    step count for the run banner (reference: timers.F, main.F:45-47).
    """
    from roms_tpu.monitor import check_blowup

    if nsteps is None:
        nsteps = cfg.ntimes
    w1, w2, nfast = set_weights(cfg.ndtfast)
    dtype = state.zeta.dtype
    w1 = jnp.asarray(w1, dtype)
    w2 = jnp.asarray(w2, dtype)

    rows = []

    def log(st, iic):
        if collect_diag and _diag_due(iic, ninfo):
            d = compute_diag(st, grid, cfg)
            row = (iic, float(d.avke), float(d.avke2b),
                   float(d.cu_adv), float(d.cu_w))
            rows.append(row)
            if print_diag:
                print(f"{iic:3d} {row[1]:.16E} {row[2]:.16E} "
                      f"{row[3]:.16E} {row[4]:.16E}")
            if blowup_check:
                check_blowup(row[1:], iic, error_log=error_log)

    t0 = float(state.time)   # one sync up front; model time advances by dt
    if timers is not None:
        timers.tic("step")
    log(state, 0)
    for i in range(nsteps):
        frc = forcing if forcing_fn is None else _call_forcing_fn(
            forcing_fn, t0 + i * cfg.dt, forcing, state)
        state = step(state, frc, grid, w1, w2, cfg, first_step=(i == 0))
        log(state, i + 1)
        if step_hook is not None:
            step_hook(state, i + 1)
    if step_hook is not None and hasattr(step_hook, "drain"):
        step_hook.drain()        # async writers: everything on disk first
    if timers is not None:
        timers.toc("step", sync=state.zeta)
        timers.nsteps += nsteps
    return state, np.asarray(rows)


def run_distributed(grid, state, forcing, cfg: ModelConfig, mesh,
                    nsteps: int | None = None, collect_diag: bool = True,
                    print_diag: bool = False, blowup_check: bool = True,
                    step_hook=None, forcing_fn=None, ninfo: int = 1,
                    error_log=None, timers=None):
    """Distributed analog of `run`: inputs are padded-global arrays; the
    state is converted to block-halo layout, stepped under shard_map on
    `mesh`, monitored with the deterministic distributed diagnostics
    (reference: diag.F cross-rank reduction + blowup test diag.F:624-634),
    and converted back at the end.

    forcing_fn: the set_forces analog for time-dependent forcing under the
    mesh (reference: every rank re-reads/interpolates forcing each step,
    roms_read_write.F:303-652 set_frc_data_* called from set_forces,
    main.F:385-386).  Called on the HOST each step as
    `forcing_fn(time_seconds, base_global_forcing, state_view)` with the
    padded-GLOBAL base forcing (exactly as in the single-device driver);
    the returned global Forcing is converted to block-halo layout and
    device_put with the mesh sharding.  The model time is tracked
    host-side (t0 + i*dt) so the hook costs no device sync.  For 3-arg
    hooks `state_view` is a SURFACE-ONLY padded-global view of the live
    state: `.t` is (nt, 1, ...) and `.u`/`.v` are (1, ...) holding the top
    sigma level, so `st.t[itemp, -1]` / `st.u[-1]` read exactly as on the
    full state — this is what bulk forcing needs (reference: bulk_frc.F
    consumes t(:,:,N,nrhs,itemp) and the surface u,v only).  Hooks tagged
    `forcing_fn.needs_state = False` skip the (cheap, 2D) gather.

    Returns (state_padded_global_numpy, diag_rows).
    """
    from roms_tpu.diag import make_distributed_diag
    from roms_tpu.monitor import check_blowup
    from roms_tpu.parallel.dist import (from_blocked, make_distributed_step,
                                        pad_for_mesh, to_blocked)

    if nsteps is None:
        nsteps = cfg.ntimes
    w1, w2, _ = set_weights(cfg.ndtfast)
    dtype = state.zeta.dtype
    w1 = jnp.asarray(w1, dtype)
    w2 = jnp.asarray(w2, dtype)

    h = cfg.halo
    cfg_p = pad_for_mesh(cfg, mesh)   # no-op when mesh-divisible
    pads = (cfg_p.pad_n, cfg_p.pad_e)
    state_b = to_blocked(state, mesh, h, pads=pads)
    forcing_b = to_blocked(forcing, mesh, h, pads=pads)
    grid_b = to_blocked(grid, mesh, h, pads=pads)
    step_first, step_rest = make_distributed_step(cfg, mesh)
    diag_fn = make_distributed_diag(cfg_p, mesh) if collect_diag else None

    rows = []

    def log(st, iic):
        if not collect_diag or not _diag_due(iic, ninfo):
            return
        d = diag_fn(st, grid_b)
        row = (iic, float(d.avke), float(d.avke2b),
               float(d.cu_adv), float(d.cu_w))
        rows.append(row)
        if print_diag:
            print(f"{iic:3d} {row[1]:.16E} {row[2]:.16E} "
                  f"{row[3]:.16E} {row[4]:.16E}")
        if blowup_check:
            check_blowup(row[1:], iic, error_log=error_log)

    pass_state = (forcing_fn is not None and _accepts_state(forcing_fn)
                  and getattr(forcing_fn, "needs_state", True))

    def surface_view(st_b):
        """Gather the top sigma level of t/u/v to padded-global numpy —
        the only live-state fields a set_forces hook consumes (bulk
        forcing SST + surface currents, reference: bulk_frc.F:150-170)."""
        from types import SimpleNamespace
        surf = from_blocked({"t": st_b.t[:, -1:], "u": st_b.u[-1:],
                             "v": st_b.v[-1:]}, mesh, h, pads=pads)
        return SimpleNamespace(**surf)

    t0 = float(state.time)
    if timers is not None:
        timers.tic("step")
    log(state_b, 0)
    for i in range(nsteps):
        fn = step_first if i == 0 else step_rest
        if forcing_fn is not None:
            st_view = surface_view(state_b) if pass_state else None
            frc = _call_forcing_fn(forcing_fn, t0 + i * cfg.dt, forcing,
                                   st_view)
            frc_b = to_blocked(frc, mesh, h, pads=pads)
        else:
            frc_b = forcing_b
        state_b = fn(state_b, frc_b, grid_b, w1, w2)
        log(state_b, i + 1)
        if step_hook is not None:
            step_hook(state_b, i + 1)
    if step_hook is not None and hasattr(step_hook, "drain"):
        step_hook.drain()        # async writers: everything on disk first
    if timers is not None:
        timers.toc("step", sync=state_b.zeta)
        timers.nsteps += nsteps
    return from_blocked(state_b, mesh, h, pads=pads), np.asarray(rows)
