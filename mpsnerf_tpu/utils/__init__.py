from mpsnerf_tpu.utils.profiling import trace_scope, annotate

__all__ = ["trace_scope", "annotate"]
