"""Per-worker thread-pool capping.

Every Ray worker process embeds pyarrow (default compute pool = num_cpus
threads) and may import polars (default = one thread per core).  With N
concurrent workers that is N × cores runnable threads — e.g. 24 write tasks
× 32 arrow threads = 768 threads thrashing a 32-core node; the reduce/write
waves measured 4-6× slower than their single-process kernel times.

``cap_threads()`` pins both pools to a small constant in the CURRENT
process; parallelism comes from Ray tasks, not intra-op threads.  Call it
at the top of every worker-side function / actor ``__init__`` (idempotent,
~free after the first call).
"""

from __future__ import annotations

import os

_done = False


def cap_threads(n: int = 2) -> None:
    global _done
    if _done:
        return
    os.environ.setdefault("POLARS_MAX_THREADS", str(n))
    try:
        import pyarrow as pa

        pa.set_cpu_count(n)
        pa.set_io_thread_count(max(2, n))
    except Exception:
        pass
    _done = True
