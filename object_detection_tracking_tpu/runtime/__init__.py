"""Runtime: pipelined device execution, AOT compile cache, observability."""

from .runner import DetectionRunner  # noqa: F401
from .profiler import PerformanceLogger  # noqa: F401
from .aot import enable_persistent_cache, aot_compile  # noqa: F401
