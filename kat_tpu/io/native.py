"""ctypes bindings for the native FASTX reader (kat_tpu/native/fastxio.cpp).

The native reader is the framework's equivalent of jellyfish's C++
mer_overlap_sequence_parser + stream_manager hot path (SURVEY §2.2): it
parses FASTA/FASTQ(.gz) and emits densely packed, already-2-bit-encoded
[rows, row_len] uint8 batches with record separators and (k-1) seams, ready
for device upload.  Built on demand with g++ (cached in ~/.cache/kat_tpu);
callers fall back to the pure-Python path when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native",
                    "fastxio.cpp")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _host_key() -> str:
    # -march=native objects must not survive a VM migration to a host with
    # a different CPU (SIGILL); key the cache on the CPU feature flags.
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
        return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        return "default"


def _build_lib() -> str | None:
    cache = os.environ.get(
        "KAT_TPU_NATIVE_CACHE",
        os.path.expanduser(f"~/.cache/kat_tpu/native-{_host_key()}"))
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libfastxio.so")
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(_SRC)):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", so + ".tmp", "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so + ".tmp", so)
        return so
    except (subprocess.SubprocessError, OSError):
        return None


def get_lib() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so = _build_lib()
        if so is None:
            _lib_failed = True
            return None
        lib = ctypes.CDLL(so)
        lib.kat_fastx_open.restype = ctypes.c_void_p
        lib.kat_fastx_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.kat_fastx_close.argtypes = [ctypes.c_void_p]
        lib.kat_fastx_next_codes.restype = ctypes.c_int64
        lib.kat_fastx_next_codes.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _stream_file(lib, path: str, trim: int, k: int, rows: int,
                 row_len: int) -> Iterator[np.ndarray]:
    buf = np.empty((rows, row_len), np.uint8)
    h = lib.kat_fastx_open(path.encode(), int(trim))
    if not h:
        raise OSError(f"could not open sequence file: {path}")
    try:
        while True:
            n = lib.kat_fastx_next_codes(
                h, k, rows, row_len,
                buf.ctypes.data_as(ctypes.c_void_p))
            if n < 0:
                raise RuntimeError(f"native reader error on {path}")
            if n == 0:
                break
            yield buf[:n].copy()
    finally:
        lib.kat_fastx_close(h)


def _trims_for(paths: list[str], trim5: list[int] | None) -> list[int]:
    trims = list(trim5) if trim5 else [0] * len(paths)
    if len(trims) == 1 and len(paths) > 1:
        trims = trims * len(paths)
    return trims


def stream_code_batches(paths: list[str], k: int,
                        trim5: list[int] | None = None,
                        rows: int = 4096,
                        row_len: int = 1024,
                        threads: int = 1) -> Iterator[np.ndarray]:
    """Yield dense [<=rows, row_len] uint8 code batches across files.

    Records are packed back to back with invalid separators; a record split
    across rows repeats its (k-1)-base seam so every k-window appears
    exactly once.  Raises RuntimeError if the native library is missing.

    threads > 1 parses up to that many FILES concurrently (the reference's
    stream_manager hands one stream per consumer thread the same way,
    deps/jellyfish-2.2.0/include/jellyfish/stream_manager.hpp) — ctypes
    releases the GIL during the native parse+inflate, so gz decompression
    genuinely parallelizes.  Batch ORDER then interleaves across files:
    use only for order-independent consumers (k-mer counting is).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastxio library unavailable")
    trims = _trims_for(paths, trim5)
    threads = max(1, min(int(threads), len(paths)))
    if threads == 1:
        for path, trim in zip(paths, trims):
            yield from _stream_file(lib, path, trim, k, rows, row_len)
        return

    import queue

    q: queue.Queue = queue.Queue(maxsize=2 * threads)
    work = iter(list(zip(paths, trims)))
    work_lock = threading.Lock()

    def worker() -> None:
        try:
            while True:
                with work_lock:
                    item = next(work, None)
                if item is None:
                    break
                for batch in _stream_file(lib, item[0], item[1], k, rows,
                                          row_len):
                    q.put(batch)
        except BaseException as e:  # noqa: BLE001 — re-raised at consumer
            q.put(e)
        finally:
            q.put(None)

    workers = [threading.Thread(target=worker, daemon=True,
                                name=f"kat-tpu-reader-{i}")
               for i in range(threads)]
    for t in workers:
        t.start()
    live = threads
    while live:
        item = q.get()
        if item is None:
            live -= 1
        elif isinstance(item, BaseException):
            raise item
        else:
            yield item


def reader_threads_default(n_paths: int) -> int:
    """Reader parallelism for order-independent counting consumers:
    KAT_TPU_READER_THREADS, else one thread per file capped at half the
    host's cores (leave the rest for the dispatch loop / analysis)."""
    env = os.environ.get("KAT_TPU_READER_THREADS")
    if env is not None:
        return max(1, int(env))
    return max(1, min(n_paths, (os.cpu_count() or 2) // 2, 8))
