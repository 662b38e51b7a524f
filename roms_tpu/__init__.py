"""roms_tpu — a TPU-native regional ocean modeling framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
UCLA-ROMS ([C]Worthy fork) reference model: a free-surface, terrain-following
(sigma-coordinate), split-explicit, primitive-equation regional ocean model on
a staggered Arakawa-C grid.

Design (TPU-first, not a port):
  * Model state is an explicit, immutable pytree (`roms_tpu.state.OceanState`)
    — no global module arrays.  One baroclinic step is a pure function
    `step(state, grid, cfg) -> state` that JIT-compiles to a single XLA
    program (the barotropic sub-cycling is a `lax.scan`).
  * Static configuration (`roms_tpu.config.ModelConfig`) is frozen into the
    JIT specialization, mirroring the reference's compile-time CPP flags
    (reference: src/cppdefs.opt, src/param.opt).
  * Horizontal fields carry a 2-cell halo on every side, exactly like the
    reference's MPI-local arrays (reference: src/set_global_definitions.h:146,
    GLOBAL_2D_ARRAY = -1:Lm+2,-1:Mm+2).  Halo refresh is a single primitive
    (`roms_tpu.parallel.halo`) implemented with in-array wraps on one device
    and `lax.ppermute` neighbor exchange on a 2D device mesh
    (reference: src/mpi_exchanges.F).
  * Layout is (k, j, i) with i fastest (TPU lane dimension).
"""

__version__ = "0.1.0"

from roms_tpu.config import ModelConfig  # noqa: F401
