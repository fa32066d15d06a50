from cosmomc_tpu.io.chains import ChainWriter, load_chain

__all__ = ["ChainWriter", "load_chain"]
