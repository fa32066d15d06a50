from cosmomc_tpu.sampling.proposal import BlockedProposal
from cosmomc_tpu.sampling.metropolis import MetropolisSampler
from cosmomc_tpu.sampling.convergence import gelman_rubin_evalues, gelman_rubin_r

__all__ = ["BlockedProposal", "MetropolisSampler", "gelman_rubin_evalues",
           "gelman_rubin_r"]
