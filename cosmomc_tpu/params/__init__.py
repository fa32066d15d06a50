from cosmomc_tpu.params.space import Param, ParameterSpace

__all__ = ["Param", "ParameterSpace"]
