"""roms.in parser tests against the reference's own input files
(reference: src/read_inp_mod.F, tests/Filament/benchmark.in)."""

from roms_tpu.cases import filament
from roms_tpu.runconfig import read_inp


def test_parse_reference_filament_benchmark_in():
    rc = read_inp("/root/reference/tests/Filament/benchmark.in")
    ov = rc.overrides
    assert ov["ntimes"] == 20
    assert ov["dt"] == 5.0
    assert ov["ndtfast"] == 60
    assert ov["theta_s"] == 6.0
    assert ov["theta_b"] == 2.0
    assert ov["hc"] == 25.0
    assert ov["rho0"] == 1000.0
    assert ov["visc2"] == 0.0
    assert ov["gamma2"] == 1.0
    assert ov["tnu2"] == 0.0
    assert ov["rdrg"] == 0.0
    assert ov["rdrg2"] == 1.0e-3
    assert ov["zob"] == 1.0e-2
    assert ov["ubind"] == 0.1
    assert ov["v_sponge"] == 1.0
    assert ov["tcoef"] == 0.2
    assert ov["t0"] == 1.0
    assert rc.paths["output_root"] == "fila"
    assert rc.paths["nrrec"] == 0

    cfg = rc.apply(filament.config())
    assert cfg.ntimes == 20 and cfg.dt == 5.0 and cfg.ndtfast == 60


def test_parse_flux_frc_in():
    rc = read_inp("/root/reference/tests/Flux_frc/benchmark.in")
    assert rc.overrides["dt"] == 20.0
    assert rc.overrides["ndtfast"] == 30
    assert rc.paths["grid"].endswith("example_input_grid.nc")


def test_strict_rejects_unknown_keywords(tmp_path):
    """The parser must error on unrecognized keywords like the reference
    (reference: read_inp_mod.F keyword registry aborts on unknown names;
    round-2 review: silently recording them let configs run with half
    their physics off)."""
    import pytest

    p = tmp_path / "bad.in"
    p.write_text("""\
title:
    test

time_stepping: NTIMES   dt[sec]  NDTFAST  NINFO
               2        20       30       1

frobnicate: VALUE
    42
""")
    with pytest.raises(ValueError, match="frobnicate"):
        read_inp(str(p))
    rc = read_inp(str(p), strict=False)
    assert rc.paths["unknown_keywords"] == ["frobnicate"]


def test_climatology_edge_series(tmp_path):
    """Climatology file supplies boundary tracer rows (reference:
    read_inp_mod.F:1026-1034 clm alternative to BRY; t3dbc_im.F tclm
    rows), with monthly cycling."""
    import numpy as np
    from roms_tpu.cases import uswc
    from roms_tpu.experiment import _clm_edge_series
    from roms_tpu.io.netcdf import open_dataset

    dom = uswc.domain()
    init = uswc.initial_state(dom)
    p = str(tmp_path / "clm.nc")
    uswc.write_climatology(p, dom, init, tracer_names=("temp", "salt"))
    with open_dataset(p) as ds:
        s = _clm_edge_series(ds, "temp", "west")
        v0 = s.value(uswc.T0_DAYS * 86400.0)
        assert v0.shape == (uswc.NZ, uswc.NY + 2)
        # cycling: one full year later gives the same value
        v1 = s.value((uswc.T0_DAYS + 365.25) * 86400.0)
        np.testing.assert_allclose(v1, v0, rtol=1e-12)
        # the sampled column is the boundary RING itself (col 0 on the
        # joined n+2 layout), not the first interior column — the
        # reference applies tclm(istr-1) etc. (t3dbc_im.F:158,233,301)
        rec0 = np.asarray(ds["temp"][0], np.float64)
        ring = rec0[:, :, 0]
        interior = rec0[:, :, 1]
        s0 = np.asarray(s.value_at_record(0) if hasattr(s, "value_at_record")
                        else s.value(float(np.asarray(ds["clm_time"][0]))
                                     * 86400.0), np.float64)
        np.testing.assert_allclose(s0, ring, rtol=1e-12)
        if not np.allclose(ring, interior):
            assert not np.allclose(s0, interior)
