"""Offline tools (reference: Tools-Roms/): partit, ncjoin, nc3to4z, zslice.

CLI entry points:
    python -m roms_tpu.tools.partition partit NP_X NP_E file.nc ...
    python -m roms_tpu.tools.partition ncjoin out.nc part.0.nc part.1.nc ...
    python -m roms_tpu.tools.partition nc3to4z in.nc out.nc
"""

from roms_tpu.tools.partition import ncjoin, nc3to4z, node_blocks, partit  # noqa: F401
