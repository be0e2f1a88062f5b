"""Out-of-memory error classification, shared by the benchmark suite's
subprocess-isolated cells and the trainer's automatic grad-accumulation
fallback (``--grad_accum auto``).

On a directly-attached TPU an HBM overflow surfaces as
``RESOURCE_EXHAUSTED``; on the tunneled backend a compile-time HBM
budget failure comes back as an ``INTERNAL`` error wrapping the compile
service's HTTP 500 whose body contains "Ran out of memory" /
"Largest program allocations" (BENCHMARKS.md). Matching is on the
message because the backend raises a single ``XlaRuntimeError`` type
for every failure class.
"""

OOM_MARKERS = (
    "RESOURCE_EXHAUSTED",  # runtime allocation failure
    "ResourceExhausted",
    "Ran out of memory",  # compile-time HBM budget failure (the tunneled
    "Largest program allocations",  # backend wraps it in INTERNAL/HTTP 500)
)


def is_oom_error(e: BaseException) -> bool:
    """True when the exception message identifies a device HBM overflow
    (compile-time or runtime)."""
    msg = str(e)
    return any(m in msg for m in OOM_MARKERS)
