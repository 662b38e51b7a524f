"""Distributed real-data regression: a file-driven USWC case (flux_frc,
199x99x50) runs on the 8-virtual-device mesh through the FULL forcing
path — reference-schema NetCDF inputs, multi-file record search, two-slot
time interpolation re-evaluated every step — and must reproduce the same
frozen oracle as the single-device run (reference: every test case runs
on 6 MPI ranks against the same benchmark series as any other rank
count, tests/scripts/test_roms.py + do_test_roms.sh:33-35; forcing is
re-read/interpolated on every rank every step, roms_read_write.F:303-652
set_frc_data_* from set_forces, main.F:385-386).

The 199x99 grid is NOT mesh-divisible (pad_e=1/pad_n=1 on the 2x4 mesh),
so this also regression-tests the inert-pad path on real-data shapes.
"""

import jax
import numpy as np
import pytest

from realcase_utils import check_against_oracle, tracer_masses

from roms_tpu.cases import flux_frc
from roms_tpu.parallel.dist import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_flux_frc_distributed_matches_oracle(tmp_path):
    exp = flux_frc.build(str(tmp_path), ntimes=20)
    mesh = make_mesh(8)
    st, rows = exp.run_distributed(mesh, nsteps=20)
    exp.fileset.close()
    # st is the padded-global numpy state; the frozen oracle is the
    # single-device series — same physics, same file inputs, same grid
    check_against_oracle("flux_frc", np.asarray(rows))

    # the tracer-content regression too (the diag series cannot see
    # passive tracers)
    class _G:
        pass

    masses = tracer_masses(st, exp.grid)
    import os
    from realcase_utils import DATA
    m_oracle = np.atleast_1d(
        np.loadtxt(os.path.join(DATA, "flux_frc_mass_oracle.txt")))
    np.testing.assert_allclose(masses, m_oracle, rtol=1e-9)
