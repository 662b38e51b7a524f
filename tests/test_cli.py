"""End-to-end CLI test: grid+init files -> `python -m roms_tpu case.in`
(reference workflow: `./roms <file>.in`, src/main.F)."""

import subprocess
import sys

import numpy as np

from roms_tpu.cases import obc_basin
from roms_tpu.io import HistoryWriter, open_dataset, write_grid

IN_TEMPLATE = """\
title:
   CLI smoke test

time_stepping: NTIMES   dt[sec]  NDTFAST  NINFO
               3        60       20       1

S-coord: THETA_S,   THETA_B,    hc (m)
          3.0D0        0.0D0     50.0D0

rho0:
      1000.

lateral_visc:   VISC2
                 0.

gamma2:
                  1.D0

tracer_diff2: TNU2
 0.

bottom_drag:     RDRG [m/s],  RDRG2,  Zob [m]
                  0.          1.0E-3   1.E-2

lin_rho_eos:  Tcoef    T0    Scoef   S0
              0.20   1.0   0.822  1.0

grid:  filename
     {grid}

initial: NRREC  filename
          0
     {init}

output_root_name:
     {root}
"""


def test_cli_end_to_end(tmp_path):
    cfg = obc_basin.config("closed", ntimes=3).replace(
        nx=16, ny=12, nz=6, nt=1, dt=60.0, ndtfast=20)
    grid, st, forcing = obc_basin.setup(cfg)
    gpath = str(tmp_path / "grid.nc")
    ipath = str(tmp_path / "init.nc")
    write_grid(gpath, grid, cfg)
    hw = HistoryWriter(ipath, grid, cfg, dtype="f8")
    hw.write(st)
    hw.close()

    infile = str(tmp_path / "run.in")
    root = str(tmp_path / "cli")
    with open(infile, "w") as f:
        f.write(IN_TEMPLATE.format(grid=gpath, init=ipath, root=root))

    res = subprocess.run(
        [sys.executable, "-m", "roms_tpu", infile,
         "--nx", "16", "--ny", "12", "--nz", "6", "--nt", "1",
         "--f64", "--nhis", "1"],
        capture_output=True, text=True, timeout=3000,
        env={"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/local/bin:/usr/bin:/bin",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
             "HOME": "/root"})
    assert res.returncode == 0, res.stderr + res.stdout
    assert "run_time" in res.stdout

    with open_dataset(root + "_his.nc") as ds:
        assert ds["zeta"].shape[0] == 3
        assert np.isfinite(ds["zeta"][...]).all()
    with open_dataset(root + "_rst.nc") as ds:
        assert "zeta" in ds.variables
