"""Multi-device / multi-host chain parallelism (mesh, collectives)."""

from cosmomc_tpu.parallel.mesh import (CHAIN_AXIS, chain_mesh, shard_chains,
                                       chain_stats_local, sharded_chain_stats,
                                       sharded_gelman_rubin_r)  # noqa: F401
