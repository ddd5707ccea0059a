"""sketchlib — PySpark-native distributed sketch library (see SURVEY.md).

Environment guard, applied before NumPy is first imported in any process
that enters through sketchlib (driver, pytest, or a Spark Python worker
unpickling a sketchlib closure): NumPy madvises THP for allocations >= 4 MB,
and on hosts whose `transparent_hugepage/defrag` mode does synchronous
compaction (this sandbox: `[madvise]`) every large fresh allocation can
stall for seconds in the kernel compaction path (measured: 80 MB alloc+zero
11 s -> 45 ms with the madvise disabled). Sketch builds preallocate and
reuse workspaces anyway (sketchlib.hashing), so hugepages buy nothing here.
"""

import os

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

# glibc returns >128 KB allocations straight to the kernel (mmap/munmap per
# temporary), so NumPy ufunc temporaries of tens of MB re-fault their pages
# on every expression. Raising the thresholds keeps the heap warm. The env
# vars (MALLOC_MMAP_THRESHOLD_ etc.) only work if set before process start,
# so apply mallopt directly; harmless no-op on non-glibc platforms.
#
# Process-wide side effect, so OPT-OUT-able: freed heap above the raised
# thresholds stays resident, which a host application embedding this library
# may not want. SKETCHLIB_MALLOC_TUNE=0 disables it (the repo's own
# entrypoints and Spark workers keep the default-on fast path).
def _tune_malloc() -> None:
    if os.environ.get("SKETCHLIB_MALLOC_TUNE", "1") == "0":
        return
    try:
        import ctypes
        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 29)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 29)
    except Exception:
        pass


_tune_malloc()
