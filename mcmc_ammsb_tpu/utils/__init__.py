"""Cross-cutting utilities: stage timing/stats and logging."""

from mcmc_ammsb_tpu.utils.timing import StageTimers
