"""Compute engines (jnp reference paths + Pallas TPU kernels).

TPU-native replacement of the reference's L2 CUDA-codegen layer
(SURVEY.md §2.3 N1-N9).  Each engine has a pure-jnp implementation (runs on
any backend; the correctness oracle for CPU CI) and, for the hot
bandwidth-bound ops, a Pallas kernel selected on TPU.
"""
