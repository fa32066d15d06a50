from cosmomc_tpu.utils.ini import IniFile
from cosmomc_tpu.utils.paramnames import ParamNames, ParamInfo

__all__ = ["IniFile", "ParamNames", "ParamInfo"]
