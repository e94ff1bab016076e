"""Environment tuning for this VM.

Transparent huge pages (madvise + defrag) cause multi-second khugepaged /
kcompactd stalls on every fresh large mmap first-touch in this Firecracker
sandbox (measured: 64 MB NumPy alloc+multiply 3-18 s with THP, 0.1-0.2 s
without).  Spark executors + Arrow buffers allocate constantly, so disable
THP best-effort at process start.  Harmless no-op where not permitted.
"""

from __future__ import annotations


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
