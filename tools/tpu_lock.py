"""Cross-process TPU serialization lock.

The single v5e behind the axon tunnel cannot host two JAX client processes
(HBM co-tenancy causes spurious RESOURCE_EXHAUSTED and hangs — CLAUDE.md;
it poisoned the round-2 driver benchmark when a queue job overlapped it).
Every TPU-touching tool takes an exclusive flock on /root/repo/.tpu_lock
before creating the JAX client; the lock is released by the kernel on
process exit, so a crashed holder cannot wedge the queue.

Usage:
    from tools.tpu_lock import tpu_lock
    with tpu_lock():            # blocks until exclusive
        ... jax work ...

    with tpu_lock(timeout=60):  # raises TimeoutError instead of waiting
        ...

Shell scripts should use `flock /root/repo/.tpu_lock <cmd>` for the same
effect (same lock file).
"""
from __future__ import annotations

import contextlib
import fcntl
import os
import sys
import time

LOCK_PATH = "/root/repo/.tpu_lock"


def start_watchdog(stale_s: float = 1500.0):
    """Stale-progress watchdog shared by the TPU benches.

    The tunnel relay can die mid-run, leaving the host blocked forever in a
    remote call (observed: backend-init and in-sampler hangs). A blocked
    thread can't time itself out, so a daemon thread hard-exits the process
    when no progress lands for ``stale_s``. Returns a ``tick(msg)`` callable
    that prints the message to stderr AND feeds the watchdog.
    """
    import threading

    progress_ts = [time.monotonic()]

    def tick(msg: str) -> None:
        progress_ts[0] = time.monotonic()
        print(msg, file=sys.stderr, flush=True)

    def run():
        while True:
            time.sleep(30)
            if time.monotonic() - progress_ts[0] > stale_s:
                print(f"WATCHDOG: no progress for {stale_s:.0f}s — tunnel "
                      "likely dead; aborting", file=sys.stderr, flush=True)
                os._exit(3)

    threading.Thread(target=run, daemon=True).start()
    return tick


@contextlib.contextmanager
def tpu_lock(timeout: float | None = None, path: str = LOCK_PATH):
    # Re-entrancy across process trees: several TPU tools re-exec themselves
    # as phase subprocesses (bench.py --phase, bench_cogvideox.py
    # --phase sample/decode). The holder exports MRT_TPU_LOCK_HELD so its
    # children skip the flock instead of deadlocking against their parent.
    if os.environ.get("MRT_TPU_LOCK_HELD"):
        yield
        return
    # CPU-only smoke runs (--small by bench-tool convention) never create a
    # TPU client — serializing them against a real TPU bench holding the
    # lock is a pure deadlock (burned twice: bench_train/bench_dc_blocks
    # --small hung behind 30-min TPU compiles)
    if "--small" in sys.argv:
        yield
        return
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        t0 = time.time()
        announced = False
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except BlockingIOError:
                if timeout is not None and time.time() - t0 > timeout:
                    raise TimeoutError(f"TPU lock {path} held by another process")
                if not announced:
                    print(f"[tpu_lock] waiting for {path} "
                          "(another TPU process is running)", file=sys.stderr, flush=True)
                    announced = True
                time.sleep(2)
        os.truncate(fd, 0)
        os.write(fd, f"pid={os.getpid()} argv={' '.join(sys.argv)}\n".encode())
        os.environ["MRT_TPU_LOCK_HELD"] = "1"
        yield
    finally:
        os.environ.pop("MRT_TPU_LOCK_HELD", None)
        os.close(fd)  # releases the flock
