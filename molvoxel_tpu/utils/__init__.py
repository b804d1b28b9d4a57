from .timing import enable_compilation_cache, measure_device_fn, trace

__all__ = ["enable_compilation_cache", "measure_device_fn", "trace"]
