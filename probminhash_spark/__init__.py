"""probminhash_spark — a PySpark-native near-duplicate detection and
clustering engine re-expressing jean-pierreBoth/probminhash's sketch family
(ProbMinHash3/3a, SuperMinHash, SetSketch, OPH+densification) as Arrow-batched
DataFrame pipelines with LSH banding, exact verification, and
connected-components clustering.

Layout:
- kernels/    pure-numpy sketch algorithms (ports of src/*.rs, SURVEY.md §2.1)
- functions/  pandas UDFs + native Column helpers
- operators/  DataFrame-level dedup / similarity / text / clustering ops
- pipeline/   staged, checkpointed, resumable dedup pipeline
- streaming/  Structured Streaming incremental variants
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large freed buffers on the heap instead of returning them to the
    kernel (glibc mallopt M_MMAP_THRESHOLD / M_TRIM_THRESHOLD).

    The numpy kernels churn through multi-MB temporaries per Arrow batch; on
    microVM kernels (Firecracker-class) re-faulting those pages on every
    allocation costs ~100x the arithmetic.  Raising the thresholds makes the
    first batch pay the faults once and every later batch reuse warm pages.
    Runs in the driver *and* in each forked PySpark worker (this module is
    imported inside every UDF closure).
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(1 << 30))  # M_MMAP_THRESHOLD
        libc.mallopt(ctypes.c_int(-1), ctypes.c_int(1 << 30))  # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


_tune_malloc()
