"""Grid lifecycle CLI (`python -m cosmomc_tpu.grid`) — the user surface of
the reference's makeGrid.py / runbatch.py / checkConverge.py scripts
(python/makeGrid.py:1-40, python/runbatch.py:1-30, python/checkConverge.py).
Uses the same tiny grid as test_grid.py; `run --queue` goes through a fake
submit command so nothing touches a real scheduler."""

import json
import os

import pytest

from cosmomc_tpu.grid.__main__ import main

DATA = "/root/reference/data"


@pytest.fixture
def settings_py(tmp_path):
    bao_ini = tmp_path / "bao.ini"
    bao_ini.write_text(
        f"bao_dataset[DR12] = {DATA}/DR12/sdss_DR12Consensus_bao.dataset\n")
    p = tmp_path / "settings_grid.py"
    p.write_text(
        "params = [[], ['w']]\n"
        "param_ini_keys = {'w': {'param[w]': '-1 -3 1 0.1 0.05'}}\n"
        f"datasets = [DataSet('bao', [{str(bao_ini)!r}])]\n"
        "importance_runs = [('HST', {'use_HST': 'T'})]\n"
        "defaults = {'samples': '4000', 'feedback': '0',\n"
        "            'parameterization': 'background'}\n")
    return str(p)


def test_make_run_status(tmp_path, settings_py, capsys):
    batch_dir = str(tmp_path / "grid")
    assert main(["make", batch_dir, settings_py]) == 0
    out = capsys.readouterr().out
    # 2 param sets x 1 dataset x (1 + 1 importance) = 4 jobs
    assert "4 jobs" in out and "base_w_bao" in out
    assert os.path.isfile(os.path.join(batch_dir, "iniFiles",
                                       "base_bao.ini"))

    # queue submission through a fake submitter (renders + records jobdb)
    assert main(["run", batch_dir, "--queue", "slurm",
                 "--submit-cmd", "echo"]) == 0
    out = capsys.readouterr().out
    assert "submitted base_bao" in out
    db = json.load(open(os.path.join(batch_dir, "jobdb.json")))
    assert "base_bao" in db and db["base_bao"]["script"].endswith(".sbatch")

    # status: nothing converged yet; then mark one converged via sidecar
    assert main(["status", batch_dir, "--r-tol", "0.05"]) == 0
    assert "# 0/4 converged" in capsys.readouterr().out
    from cosmomc_tpu.grid import BatchJob
    it = BatchJob.load(batch_dir).job("base_bao")
    os.makedirs(it.chain_dir, exist_ok=True)
    with open(it.chain_root + ".converge_stat", "w") as f:
        f.write("0.0213\n")
    assert main(["status", batch_dir, "--r-tol", "0.05"]) == 0
    s = capsys.readouterr().out
    assert "# 1/4 converged" in s and "R-1=0.0213" in s


def test_make_from_json(tmp_path):
    bao_ini = tmp_path / "bao.ini"
    bao_ini.write_text(
        f"bao_dataset[DR12] = {DATA}/DR12/sdss_DR12Consensus_bao.dataset\n")
    j = tmp_path / "settings.json"
    j.write_text(json.dumps({
        "params": [[]],
        "datasets": [[["bao"], [str(bao_ini)]]],
        "defaults": {"samples": "100", "parameterization": "background"},
    }))
    batch_dir = str(tmp_path / "grid")
    assert main(["make", batch_dir, str(j)]) == 0
    assert os.path.isfile(os.path.join(batch_dir, "iniFiles",
                                       "base_bao.ini"))
