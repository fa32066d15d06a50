"""Grid orchestration layer (grid/) vs the reference's paramgrid semantics:
name/tag composition (batchjob.py dataSet:72), directory layout, ini
generation with DEFAULT() fragments, converge_stat polling, importance
chaining, and an end-to-end run of one tiny grid cell through the driver.
"""

import os

import numpy as np
import pytest

from cosmomc_tpu.grid import BatchJob, DataSet, JobItem, make_grid, run_batch

DATA = "/root/reference/data"


def small_settings(tmp_path):
    bao_ini = tmp_path / "bao.ini"
    bao_ini.write_text(
        f"bao_dataset[DR12] = {DATA}/DR12/sdss_DR12Consensus_bao.dataset\n"
        "use_HST = T\n"
        "Hubble_H0 = 73.45\nHubble_H0_err = 1.66\nHubble_zeff = 0\n")
    return {
        "params": [[], ["w"]],
        "param_ini_keys": {"w": {"param[w]": "-1 -3 1 0.1 0.05"}},
        "datasets": [DataSet("bao", [str(bao_ini)]),
                     DataSet(["bao", "hst"], [str(bao_ini),
                                              {"use_HST": "T"}])],
        "importance_runs": [("HST", {"use_HST": "T"})],
        "defaults": {"samples": "4000", "num_chains": "32",
                     "segment_steps": "64", "MPI_R_Stop": "0.5",
                     "feedback": "0", "parameterization": "background"},
    }


def test_grid_structure(tmp_path):
    batch = make_grid(str(tmp_path / "grid"), small_settings(tmp_path))
    names = batch.item_names()
    # 2 param sets x 2 datasets x (1 + 1 importance) = 8 items
    assert len(names) == 8
    assert "base_bao" in names
    assert "base_w_bao_hst" in names
    assert "base_bao_post_HST" in names
    it = batch.job("base_bao")
    assert it.chain_root.endswith("base/bao/base_bao")
    assert os.path.isfile(it.ini_file)
    # importance jobs point at their parent
    imp = batch.job("base_bao_post_HST")
    assert imp.importance_of is it


def test_grid_persistence_roundtrip(tmp_path):
    batch = make_grid(str(tmp_path / "grid"), small_settings(tmp_path))
    loaded = BatchJob.load(batch.batch_path)
    assert loaded.item_names() == batch.item_names()
    imp = loaded.job("base_bao_post_HST")
    assert imp.importance_of.name == "base_bao"


def test_converge_stat_polling(tmp_path):
    batch = make_grid(str(tmp_path / "grid"), small_settings(tmp_path))
    it = batch.job("base_bao")
    assert not it.is_converged()
    assert batch.unfinished() == batch.items
    os.makedirs(it.chain_dir, exist_ok=True)
    with open(it.chain_root + ".converge_stat", "w") as f:
        f.write("0.0213\n")
    r, done = it.converge_stat()
    assert r == pytest.approx(0.0213) and not done
    assert it.is_converged(r_tol=0.05)
    assert not it.is_converged(r_tol=0.01)
    with open(it.chain_root + ".converge_stat", "w") as f:
        f.write("0.0213\nDone\n")
    assert it.is_converged()


def test_run_batch_with_custom_submit(tmp_path):
    """run_batch delegates unfinished jobs to the submit callable."""
    batch = make_grid(str(tmp_path / "grid"), small_settings(tmp_path))
    submitted = []
    run_batch(batch, submit=lambda it: submitted.append(it.name) or 0)
    assert len(submitted) == len(batch.items)
    # mark one converged -> resubmit skips it
    it = batch.job("base_bao")
    os.makedirs(it.chain_dir, exist_ok=True)
    with open(it.chain_root + ".converge_stat", "w") as f:
        f.write("0.001\nDone\n")
    submitted.clear()
    run_batch(batch, submit=lambda it: submitted.append(it.name) or 0)
    assert "base_bao" not in submitted and len(submitted) == 7


@pytest.mark.slow
def test_one_grid_cell_end_to_end(tmp_path):
    """Drive one cell through the real driver: chains + converge_stat."""
    settings = small_settings(tmp_path)
    settings["params"] = [[]]
    settings["datasets"] = [settings["datasets"][0]]
    settings["importance_runs"] = []
    batch = make_grid(str(tmp_path / "grid"), settings)
    rcs = run_batch(batch)
    assert rcs == {"base_bao": 0}
    it = batch.job("base_bao")
    assert it.chains_exist()
    r, _done = it.converge_stat()
    assert r is not None and np.isfinite(r)


def test_jobqueue_scripts_and_submit(tmp_path):
    """Cluster queue layer (reference python/paramgrid/jobqueue.py +
    job_script templates): render a SLURM script per grid item, submit via
    a (fake) submit command, track queue ids in the jobdb."""
    from cosmomc_tpu.grid.jobqueue import JobQueue

    batch = make_grid(str(tmp_path / "grid"), small_settings(tmp_path))
    fake = tmp_path / "fake_sbatch.sh"
    fake.write_text("#!/bin/sh\necho Submitted batch job 4242\n")
    fake.chmod(0o755)
    q = JobQueue(batch, queue="slurm", submit_cmd=[str(fake)],
                 walltime="01:00:00")
    ids = q.submit_unfinished()
    assert ids and all(i == "4242" for i in ids)
    assert set(q.queued_ids().values()) == {"4242"}
    item = batch.items[0]
    script = open(q.script_for(item)).read()
    assert "#SBATCH --job-name=" in script
    assert item.ini_file in script
    assert q.status_cmd(item.name)[-1] == "4242"

    # PBS template renders too
    q2 = JobQueue(batch, queue="pbs", submit_cmd=[str(fake)])
    s2 = open(q2.script_for(item)).read()
    assert "#PBS -N" in s2
