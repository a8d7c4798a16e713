"""kat_tpu — a TPU-native k-mer analysis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of TGAC/KAT v2.4.2
(reference: /root/reference, Mapleson et al., Bioinformatics 2016).  Instead of
KAT's shared-memory Jellyfish CAS hash (reference
deps/jellyfish-2.2.0/include/jellyfish/large_hash_array.hpp), the counting core
is a functional pack -> extract -> sort -> segment-reduce pipeline that runs on
TPU, with the k-mer space hash-partitioned across devices of a
`jax.sharding.Mesh` (k-mers routed to owner shards with `all_to_all`, low-dim
results merged with `psum`).

Public surface:
    kat_tpu.core      -- 2-bit k-mer encoding, window extraction, counting
    kat_tpu.parallel  -- device-mesh sharded counting / lookup
    kat_tpu.io        -- FASTA/FASTQ readers, jellyfish .jf codec, mme headers
    kat_tpu.tools     -- hist / gcp / comp / sect / cold / filter workloads
    kat_tpu.analysis  -- spectra / peak-fitting / distribution analysis
    kat_tpu.cli       -- `kat`-compatible command line
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: compiles dominate wall clock on TPU
# (30-40s per sort shape over the device tunnel); cache them across runs.
# Keyed by the host CPU's identity AND the boot id: XLA:CPU caches AOT
# machine code, and reusing it after a VM migration to different hardware
# SIGILLs/SIGSEGVs.  The /proc/cpuinfo flags line alone proved
# insufficient — two hosts with identical flag strings still differed in
# LLVM-detected tuning features (prefer-no-scatter/gather), so the key
# also folds in the whole processor-0 block and the boot id (a live
# migration that lands on different silicon necessarily changes at least
# one of those across the reboots this environment actually does).
def _host_key() -> str:
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            block = f.read().split("\n\n", 1)[0]
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                block += f.read()
        except OSError:
            pass
        return hashlib.sha1(block.encode()).hexdigest()[:12]
    except OSError:
        return "default"


_jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("KAT_TPU_JAX_CACHE",
                    _os.path.expanduser(f"~/.cache/kat_tpu/jax-{_host_key()}")))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# 64-bit parity: counters/totals in the reference are uint64 and scale
# factors are C doubles (e.g. gcp.cc:190 `ceil(count * scale)`).  Hot-path
# arrays (keys, per-window data) are explicitly uint32 pairs, so this only
# affects accumulators and host-visible statistics.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

DEFAULT_MER_LEN = 27  # reference: lib/include/kat/jellyfish_helper.hpp:75
DEFAULT_HASH_SIZE = 100_000_000  # reference: jellyfish_helper.hpp:76
DEFAULT_NB_BINS = 1001  # reference: lib/include/kat/comp_counters.hpp:32
