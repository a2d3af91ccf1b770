from pysfm_tpu.utils.compcache import enable_compilation_cache  # noqa: F401
