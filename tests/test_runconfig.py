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
