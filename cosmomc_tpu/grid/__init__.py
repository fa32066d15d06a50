"""Grid / batch orchestration (reference: python/paramgrid/)."""

from cosmomc_tpu.grid.batchjob import BatchJob, DataSet, JobItem, run_batch
from cosmomc_tpu.grid.gridconfig import make_grid

__all__ = ["BatchJob", "DataSet", "JobItem", "run_batch", "make_grid"]
