"""Biogeochemistry: plug-in coupling surface + built-in reduced ecosystem
(reference: src/marbl_driver.F, src/bec2_driver.F)."""

from roms_tpu.bgc.api import BGCContext, BGCModel, get_model, register  # noqa: F401
