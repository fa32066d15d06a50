"""Ini-driven driver (driver.py): action dispatch end-to-end.

Mirrors the reference's CI pattern (tests/run_tests.sh: run `cosmomc
test.ini` and check the exit code / pinned likelihood): a background-LCDM
config with BAO+HST is cheap enough to run all actions in-suite.
"""

import os

import numpy as np
import pytest

from cosmomc_tpu.driver import run_ini, build_posterior
from cosmomc_tpu.utils.ini import IniFile

REF = os.environ.get("COSMOMC_DATA", "/root/reference/data")
BAO = f"{REF}/DR12/sdss_DR12Consensus_bao.dataset"

needs_data = pytest.mark.skipif(not os.path.isfile(BAO),
                                reason="reference data not present")


def _write_ini(tmp_path, extra=""):
    ini = tmp_path / "params.ini"
    ini.write_text(f"""
file_root = {tmp_path}/chains/test
parameterization = background
bao_dataset[DR12] = {BAO}
use_HST = T
Hubble_H0 = 73.48
Hubble_H0_err = 1.66
param[omegam] = 0.3 0.1 0.7 0.02 0.02
param[H0] = 70 40 100 2 2
{extra}
""")
    return str(ini)


@needs_data
def test_action4_gate(tmp_path, capsys):
    """action=4: evaluate -logL at the central point; pin the value as this
    repo's cross-run regression gate (GeneralSetup.f90 DoTests semantics)."""
    path = _write_ini(tmp_path, "action = 4\n")
    rc = run_ini(path)
    out = capsys.readouterr().out
    assert rc == 0
    val = float(out.split("Test -log(Like) =")[1].split()[0])
    # pinned: BAO DR12 + HST at omegam=0.3, H0=70, ombh2=0.02236
    # (value recorded r2; the gate is |change| < 0.05 like the reference)
    assert abs(val - 4.7942) < 0.05, out


@needs_data
def test_action4_compare_mismatch(tmp_path):
    path = _write_ini(tmp_path, "action = 4\ntest_check_compare = 99.0\n")
    assert run_ini(path) == 1


@needs_data
def test_action0_short_run_and_outputs(tmp_path):
    path = _write_ini(tmp_path, """action = 0
num_chains = 32
segment_steps = 64
samples = 512
MPI_R_Stop = 0.0
feedback = 0
""")
    rc = run_ini(path)
    assert rc == 0
    root = f"{tmp_path}/chains/test"
    for ext in ("_1.txt", ".paramnames", ".ranges", ".converge_stat",
                ".inputparams", ".margestats", ".covmat"):
        assert os.path.exists(root + ext), ext
    dat = np.loadtxt(root + "_1.txt")
    assert dat.shape[1] >= 2 + 2  # weight, -logL, >=2 sampled params


@needs_data
def test_action2_minimize(tmp_path):
    path = _write_ini(tmp_path, "action = 2\n")
    rc = run_ini(path)
    assert rc == 0
    root = f"{tmp_path}/chains/test"
    assert os.path.isfile(root + ".minimum")
    assert os.path.isfile(root + ".hessian.covmat")
    txt = open(root + ".minimum").read()
    assert "-log(Like)" in txt


@needs_data
def test_build_posterior_param_override(tmp_path):
    """param[...] ini lines override defaults (BaseParameters.f90:107-160)."""
    ini = tmp_path / "p.ini"
    ini.write_text(f"""
file_root = {tmp_path}/chains/t
parameterization = background
bao_dataset[DR12] = {BAO}
param[omegam] = 0.31 0.2 0.4 0.01 0.01
""")
    post = build_posterior(IniFile(str(ini)))
    om = post.space.get("omegam")
    assert om.center == pytest.approx(0.31)
    assert om.min == pytest.approx(0.2)


@needs_data
def test_action0_sharded_num_devices(tmp_path):
    """The product path runs sharded: `num_devices` ini key builds a chain
    mesh and SamplingRun shards the chain state over it (the reference's
    one-rank-per-chain MPI layout, SampleCollector.f90:248-251)."""
    path = _write_ini(tmp_path, """action = 0
num_chains = 32
segment_steps = 64
samples = 512
MPI_R_Stop = 0.0
feedback = 0
num_devices = 8
""")
    rc = run_ini(path)
    assert rc == 0
    root = f"{tmp_path}/chains/test"
    dat = np.loadtxt(root + "_1.txt")
    assert dat.shape[1] >= 4
    # perf-counter log exists (MCMC.f90:299-304 .log analog)
    assert os.path.isfile(root + ".log")
    txt = open(root + ".log").read()
    assert "slow/semi/fast" in txt
