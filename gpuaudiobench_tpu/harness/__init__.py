from gpuaudiobench_tpu.harness.statistics import (  # noqa: F401
    LatencyStats,
    calculate_statistics,
    csv_percentile,
)
from gpuaudiobench_tpu.harness.validation import (  # noqa: F401
    ValidationData,
    ValidationStatus,
    compare_abs,
    compare_rel,
)
from gpuaudiobench_tpu.harness.base import Benchmark, BenchmarkResult  # noqa: F401
from gpuaudiobench_tpu.harness.runner import run_benchmark  # noqa: F401
