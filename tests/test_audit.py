"""Config consistency audit (the cppcheck/srcscheck analog,
reference: build-time cppcheck + read_inp setup checks)."""

import pytest

from roms_tpu.audit import audit_config, check_config
from roms_tpu.config import ModelConfig


def _base(**kw):
    d = dict(nx=16, ny=16, nz=4, nt=2, salinity=True,
             ew_periodic=False, ns_periodic=False)
    d.update(kw)
    return ModelConfig(**d)


def test_clean_config_has_no_errors():
    findings = audit_config(_base())
    assert not [m for s, m in findings if s == "error"]


@pytest.mark.parametrize("kw, frag", [
    (dict(nt=1, salinity=True), "salinity"),
    (dict(n_bgc=3), "bgc_model"),
    (dict(bgc_model="bec2"), "n_bgc=0"),
    (dict(nt=4, n_bgc=3, bgc_model="bec2"), "physical tracers"),
    (dict(sflx_corr=True, salinity=False, nt=1), "sflx_corr"),
    (dict(ew_periodic=True, obc_west=True), "periodic"),
    (dict(obc_west=True, obc_m2="nonsense"), "obc_m2"),
])
def test_inconsistent_configs_error(kw, frag):
    with pytest.raises(ValueError) as e:
        check_config(_base(**kw), strict=True)
    assert frag in str(e.value)


def test_warnings_do_not_raise():
    import warnings
    cfg = _base(frc_bry=True)     # no OBC edge open -> warn only
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        check_config(cfg, strict=True)
    assert any("frc_bry" in str(x.message) for x in w)
