from cupyimg_tpu.scipy.stats.distributions import entropy  # noqa: F401
