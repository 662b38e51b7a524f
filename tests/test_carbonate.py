"""Full CO2-system solver checks (reference: src/bec2_driver.F
co2calc_row/talk_row/drtsafe_row — OCMIP lineage).

The solver has no network-accessible reference implementation here, so
the checks are (a) internal: the returned [H+] must zero the full
total-alkalinity balance to the reference's own tolerance (xacc = 1e-10,
bec2_driver.F:3819), species must re-sum to DIC, and the closed-form
carbonate-alkalinity reduction must agree to a few percent at nominal
seawater; (b) physical: known qualitative behaviors of the seawater CO2
system (pCO2 up with DIC, down with ALK — the mCDR lever — calcite more
soluble than aragonite is NOT true: aragonite is MORE soluble, so
Omega_ar < Omega_ca; warming raises pCO2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.bgc.carbonate import (MASS_TO_VOL, VOL_TO_MASS, co2_flux,
                                    co2_system, constants, solve_h,
                                    ta_residual)


def _grid_cases():
    dic = np.array([1800.0, 2000.0, 2100.0, 2200.0, 2350.0]) * 1.0261
    ta = np.array([2100.0, 2250.0, 2300.0, 2400.0, 2450.0]) * 1.0261
    t = np.array([-1.5, 5.0, 15.0, 25.0, 29.0])
    s = np.array([30.0, 33.0, 34.5, 35.0, 37.0])
    po4 = np.array([0.0, 0.5, 1.0, 2.0, 3.0])
    sio3 = np.array([0.0, 2.0, 10.0, 50.0, 120.0])
    return (jnp.asarray(dic), jnp.asarray(ta), jnp.asarray(t),
            jnp.asarray(s), jnp.asarray(po4), jnp.asarray(sio3))


def test_residual_zero_at_solution():
    dic, ta, t, s, po4, sio3 = _grid_cases()
    c = constants(t, s)
    h = solve_h(dic * VOL_TO_MASS, ta * VOL_TO_MASS,
                po4 * VOL_TO_MASS, sio3 * VOL_TO_MASS, c)
    fn, _ = ta_residual(h, dic * VOL_TO_MASS, ta * VOL_TO_MASS,
                        po4 * VOL_TO_MASS, sio3 * VOL_TO_MASS, c)
    # reference tolerance: drtsafe xacc=1e-10 on H ~ residual ~ 1e-6
    # level; the fixed-iteration ladder does much better
    assert float(jnp.max(jnp.abs(fn))) < 1.0e-12


def test_species_sum_to_dic():
    dic, ta, t, s, po4, sio3 = _grid_cases()
    sol = co2_system(dic, ta, t, s, po4, sio3)
    total = sol.co2star + sol.hco3 + sol.co3
    np.testing.assert_allclose(np.asarray(total), np.asarray(dic),
                               rtol=1e-10)


def test_nominal_surface_values():
    """Modern surface seawater: DIC~2000, TA~2300 umol/kg, 15-25 C."""
    sol = co2_system(jnp.asarray([2000.0 * 1.0261, 2000.0 * 1.0261]),
                     jnp.asarray([2300.0 * 1.0261, 2300.0 * 1.0261]),
                     jnp.asarray([15.0, 25.0]),
                     jnp.asarray([35.0, 35.0]))
    ph = np.asarray(sol.ph)
    pco2 = np.asarray(sol.pco2)
    assert np.all((ph > 7.8) & (ph < 8.4))
    assert np.all((pco2 > 150.0) & (pco2 < 600.0))
    # warming at fixed DIC/TA raises pCO2 and lowers pH
    assert pco2[1] > pco2[0]
    assert ph[1] < ph[0]
    # saturation states: supersaturated surface, aragonite < calcite
    om_ca = np.asarray(sol.omega_ca)
    om_ar = np.asarray(sol.omega_ar)
    assert np.all(om_ar < om_ca)
    assert np.all((om_ca > 1.0) & (om_ca < 10.0))


def test_closed_form_agreement():
    """The bec closed-form (carbonate-alkalinity) reduction should agree
    with the full solve to a few percent at nominal seawater (its borate
    correction is the 96% factor)."""
    from roms_tpu.bgc.bec import _co2_equilibrium
    dic = jnp.asarray(2050.0 * 1.0261)
    ta = jnp.asarray(2320.0 * 1.0261)
    t = jnp.asarray(18.0)
    s = jnp.asarray(34.8)
    pco2_cf, ph_cf, _ = _co2_equilibrium(dic, ta, t, s)
    sol = co2_system(dic, ta, t, s)
    assert abs(float(sol.ph) - float(ph_cf)) < 0.1
    assert abs(float(sol.pco2) - float(pco2_cf)) / float(sol.pco2) < 0.15


def test_mcdr_alkalinity_lever():
    """Ocean alkalinity enhancement: adding TA at fixed DIC lowers pCO2
    and raises Omega — the first-order mCDR response the framework is
    built to quantify."""
    dic = jnp.full((3,), 2050.0 * 1.0261)
    ta = jnp.asarray([2300.0, 2350.0, 2400.0]) * 1.0261
    sol = co2_system(dic, ta, jnp.full((3,), 18.0), jnp.full((3,), 35.0))
    pco2 = np.asarray(sol.pco2)
    om = np.asarray(sol.omega_ar)
    assert pco2[0] > pco2[1] > pco2[2]
    assert om[0] < om[1] < om[2]
    # and pCO2 rises with DIC at fixed TA
    sol2 = co2_system(jnp.asarray([2000.0, 2080.0]) * 1.0261,
                      jnp.full((2,), 2300.0 * 1.0261),
                      jnp.full((2,), 18.0), jnp.full((2,), 35.0))
    assert float(sol2.pco2[1]) > float(sol2.pco2[0])


def test_flux_sign_and_magnitude():
    """Uptake when pCO2_air > pCO2_oc; plausible magnitude for a 7 m/s
    wind (order 1e-4..1e-2 mmol/m2/s around a ~100 uatm disequilibrium)."""
    from roms_tpu.bgc.bec import gas_transfer_velocity, schmidt_co2
    t = jnp.asarray(15.0)
    s = jnp.asarray(35.0)
    kw = gas_transfer_velocity(jnp.asarray(7.0), schmidt_co2(t))
    dic = jnp.asarray(2000.0 * 1.0261)
    ta = jnp.asarray(2300.0 * 1.0261)
    sol = co2_system(dic, ta, t, s)
    fg_hi, _ = co2_flux(dic, ta, t, s, kw, sol.pco2 + 100.0)
    fg_eq, _ = co2_flux(dic, ta, t, s, kw, sol.pco2)
    fg_lo, _ = co2_flux(dic, ta, t, s, kw, sol.pco2 - 100.0)
    assert float(fg_hi) > 0.0 > float(fg_lo)
    assert abs(float(fg_eq)) < 1e-7
    assert 1e-5 < float(fg_hi) < 1e-2


def test_seed_and_iters_insensitivity():
    """Safeguarded Newton must land on the same root from a closed-form
    seed, no seed, and extra iterations (bracketed => unique root)."""
    dic, ta, t, s, po4, sio3 = _grid_cases()
    a = co2_system(dic, ta, t, s, po4, sio3, iters=25)
    b = co2_system(dic, ta, t, s, po4, sio3, iters=60)
    c = co2_system(dic, ta, t, s, po4, sio3,
                   h_init=jnp.full(dic.shape, 1.0e-8), iters=25)
    np.testing.assert_allclose(np.asarray(a.h), np.asarray(b.h), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(a.h), np.asarray(c.h), rtol=1e-9)


def test_differentiable_and_jittable():
    """The whole solve is one static XLA program: jit-compiles, and
    grad(pCO2 wrt DIC) is positive (the Revelle response)."""
    def pco2_of_dic(dic):
        return co2_system(dic, jnp.asarray(2300.0 * 1.0261),
                          jnp.asarray(18.0), jnp.asarray(35.0)).pco2

    g = jax.jit(jax.grad(pco2_of_dic))(jnp.asarray(2050.0 * 1.0261))
    assert float(g) > 0.0
    # Revelle factor ~ 10-15: dln(pCO2)/dln(DIC)
    dic0 = 2050.0 * 1.0261
    rev = float(g) * dic0 / float(pco2_of_dic(jnp.asarray(dic0)))
    assert 5.0 < rev < 25.0


def test_masked_land_values_are_finite():
    """Clamped zero-tracer (land) columns must not produce NaNs — the
    reference skips land by mask; here the solve must stay finite so the
    masked multiply can zero it (TPU-first: no per-point control flow)."""
    sol = co2_system(jnp.zeros((4,)), jnp.zeros((4,)),
                     jnp.zeros((4,)), jnp.zeros((4,)))
    for f in sol:
        assert np.all(np.isfinite(np.asarray(f)))
