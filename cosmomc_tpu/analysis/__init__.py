"""Chain post-processing: GetDist-compatible statistics and outputs."""

from cosmomc_tpu.analysis.mcsamples import MCSamples, ParamStats  # noqa: F401
