"""Environment tuning for this VM.

Transparent huge pages (madvise + defrag) cause multi-second khugepaged /
kcompactd stalls on every fresh large mmap first-touch in this Firecracker
sandbox (measured: 64 MB NumPy alloc+multiply 3-18 s with THP, 0.1-0.2 s
without).  Spark executors + Arrow buffers allocate constantly, so disable
THP best-effort at process start.  Harmless no-op where not permitted.
"""

from __future__ import annotations

_MALLOC_TUNED = False


def tune_malloc(
    mmap_threshold: int = 512 << 20, trim_threshold: int = 128 << 20
) -> bool:
    """Stop glibc from mmap-cycling large NumPy temporaries.

    By default glibc serves allocations past M_MMAP_THRESHOLD (128 KB,
    dynamically raised to at most 32 MB) with a fresh ``mmap`` and gives
    the pages back on ``free`` — so every Arrow-batch kernel temporary is
    first-touch page-faulted again on the next batch.  Measured in this
    sandbox (300 x 16 MB alloc/compute/free): 2.44M minor faults, and
    under 32 concurrent Python workers the fault path serializes in
    kernel memcg accounting (host sampled at 71% sys / 0% usr, ~45k
    faults/s per worker; a 4-executor local-cluster run of the SE(3) kNN
    join was SLOWER than 1 executor because of it).  Raising
    M_MMAP_THRESHOLD keeps big temporaries on the brk heap and a finite
    M_TRIM_THRESHOLD (128 MB) lets truly idle workers still shrink:
    same loop runs with 4.1k faults — 600x fewer — and the fault-storm
    contention is gone.

    Called once per process on ``import sparkkd`` (Spark Python workers
    import the package when unpickling the UDF closures, so every worker
    self-tunes — no executorEnv plumbing needed).  No-op where mallopt
    is unavailable (non-glibc).  Opt out: SPARKKD_NO_MALLOC_TUNE=1."""
    global _MALLOC_TUNED
    if _MALLOC_TUNED:
        return True
    import os

    if os.environ.get("SPARKKD_NO_MALLOC_TUNE"):
        return False
    try:
        import ctypes
        import ctypes.util

        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok = bool(libc.mallopt(M_MMAP_THRESHOLD, mmap_threshold)) and bool(
            libc.mallopt(M_TRIM_THRESHOLD, trim_threshold)
        )
    except Exception:
        return False
    _MALLOC_TUNED = ok
    return ok


_ARROW_TUNED = False


def tune_arrow_pool() -> bool:
    """Switch pyarrow's default memory pool to mimalloc.

    pyarrow's bundled default is jemalloc, whose decay-based page purging
    returns Arrow-batch pages to the kernel between batches — every
    cogroup batch then refaults its buffers (the same first-touch-fault
    pathology tune_malloc fixes for NumPy temporaries, here for the Arrow
    side).  Alternating same-window A/B on the SE(3) kNN sf2 steady join
    (4M poses x 400k queries, local[32], min-of-2): jemalloc 99.6 s,
    jemalloc with decay disabled 81.8 s, **mimalloc 57.1 s** — mimalloc
    retains pages across batches and wins 1.75x end to end.

    Called on ``import sparkkd`` so every Spark Python worker self-tunes
    when it unpickles the UDF closures — before its first Arrow batch.
    Also honored via ARROW_DEFAULT_MEMORY_POOL for processes that import
    pyarrow first.  Opt out / override: SPARKKD_ARROW_POOL=off|system|
    jemalloc|mimalloc."""
    global _ARROW_TUNED
    if _ARROW_TUNED:
        return True
    import os

    choice = os.environ.get("SPARKKD_ARROW_POOL", "mimalloc").lower()
    if choice not in ("system", "mimalloc"):
        # fail safe: "off"/"jemalloc" keep pyarrow's default, and so does
        # any unrecognized value (a typo'd opt-out must not install the
        # pool it was trying to avoid)
        return False
    try:
        import pyarrow as pa

        pool = (
            pa.system_memory_pool()
            if choice == "system"
            else pa.mimalloc_memory_pool()
        )
        pa.set_memory_pool(pool)
    except Exception:
        return False
    _ARROW_TUNED = True
    return True


def disable_thp() -> bool:
    ok = True
    for f in (
        "/sys/kernel/mm/transparent_hugepage/enabled",
        "/sys/kernel/mm/transparent_hugepage/defrag",
    ):
        try:
            with open(f, "w") as fh:
                fh.write("never")
        except OSError:
            ok = False
    return ok
