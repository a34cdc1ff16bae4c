"""Flagship composite pipelines.

The reference has no "models" — its model-equivalent is the nd image
operator suite (SURVEY.md §0).  These pipelines compose that suite into the
representative end-to-end workloads used for benchmarking, the graft entry
point, and the multi-chip dry run.
"""

from cupyimg_tpu.models.pipeline import (  # noqa: F401
    edge_enhance_pipeline,
    richardson_lucy_step,
    sharded_edge_enhance,
)
