"""`python -m cosmomc_tpu params.ini` — the CLI entry (driver.F90 analog)."""
from cosmomc_tpu.driver import main

if __name__ == "__main__":
    raise SystemExit(main())
