"""Version info for cupyimg_tpu (cf. reference cupyimg/version.py:4-8)."""

__version__ = "0.1.0"
