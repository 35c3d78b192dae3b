"""Native Myers bit-parallel Levenshtein — the batch kernel behind
:func:`.text._myers_lev_column`'s Arrow boundary.

Guide §4.2's rule is "hand whole batches to vectorized native libraries"
inside the Python boundary; no edit-distance library exists in this
environment (rapidfuzz / python-Levenshtein absent; DuckDB-in-worker and
the JVM expression both measured ~25/74 core-seconds at sf0.1 — round-15
§2 evidence), so the native code is compiled HERE, once per host, from the
C translation of the same Myers 1999 / Hyyrö 2001 scoring recurrence the
pure-Python fallback implements. Properties that keep this safe:

* **Fallback-by-construction**: any failure — no C compiler, compile
  error, load error, or a self-check mismatch against the pure-Python
  reference on a pinned case battery — leaves ``get_kernel()`` returning
  ``None`` and the caller on the pure-Python path (today's behaviour,
  today's performance). The kernel can only ever be a strict improvement.
* **Value-identical by the same recurrence**: the C loop is the multi-word
  generalization of ``_myers_edit_distance``'s big-int fold (word arrays +
  explicit carries instead of one arbitrary-precision int); both iterate
  unicode code points (UTF-32), so semantics match Spark's ``levenshtein``
  exactly. ``tests/test_dedup.py::test_lev_native_kernel_matches_python``
  pins C-vs-Python agreement on a randomized unicode sweep, and the hash
  gate certifies the registered query end-to-end.
* **Compile on the driver, ship to executors**: the compiler runs only in
  the driver process (``ensure_kernel_shipped``, invoked when the Arrow
  boundary column is built); the .so is registered via
  ``SparkContext.addFile`` so executors fetch it through ``SparkFiles`` and
  never invoke ``cc`` themselves — no first-use compile storms, and a
  missing compiler on worker images cannot silently degrade a cluster. On
  a real cluster this would be a prebuilt wheel; ``addFile`` is the
  no-network form of the same move.
* **Private, ownership-checked cache**: the .so lives under a per-user
  mode-0700 cache directory (never the shared world-writable temp dir),
  and every load first verifies the file is owned by the current euid and
  not group/world-writable, so another local user cannot pre-plant a
  malicious library at a predictable path. Writes use a pid-unique temp
  name + atomic ``os.replace`` so racing processes never load a
  half-written file.

Measured at sf0.1/32 (30 912 LSH candidate pairs, 6.08e9 DP cells): the
pinned DP stage fell 1.25 s (pure-Python Myers) → ~0.25 s; ~25 Python
core-seconds → ~0.5 native core-seconds (~0.9 ns per column-word).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_C_SOURCE = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef uint64_t u64;
typedef uint32_t u32;

#define EMPTY_KEY 0xFFFFFFFFu

/* Peq hash slot lookup: open addressing, power-of-two table. */
static inline int64_t slot_for(const u32 *keys, int64_t tmask, u32 c) {
    int64_t s = (int64_t)(((u64)c * 0x9E3779B97F4A7C15ULL) >> 33) & tmask;
    while (keys[s] != EMPTY_KEY && keys[s] != c)
        s = (s + 1) & tmask;
    return s;
}

/* Single-word Myers (m <= 64): the textbook scoring form. */
static int64_t myers1(const u32 *a, int64_t m, const u32 *b, int64_t n,
                      u64 *peq, u32 *keys, int64_t tmask, int64_t *used) {
    int64_t nused = 0;
    for (int64_t i = 0; i < m; i++) {
        int64_t s = slot_for(keys, tmask, a[i]);
        if (keys[s] == EMPTY_KEY) { keys[s] = a[i]; peq[s] = 0; used[nused++] = s; }
        peq[s] |= 1ULL << i;
    }
    u64 mask = (m == 64) ? ~0ULL : ((1ULL << m) - 1);
    u64 hibit = 1ULL << (m - 1);
    u64 vp = mask, vn = 0;
    int64_t score = m;
    for (int64_t j = 0; j < n; j++) {
        int64_t s = slot_for(keys, tmask, b[j]);
        u64 eq = (keys[s] == EMPTY_KEY) ? 0 : peq[s];
        u64 d0 = (((eq & vp) + vp) ^ vp) | eq | vn;
        u64 hp = vn | ~(d0 | vp);
        u64 hn = d0 & vp;
        if (hp & hibit) score++;
        else if (hn & hibit) score--;
        hp = ((hp << 1) | 1) & mask;
        hn = (hn << 1) & mask;
        vp = hn | (~(d0 | hp) & mask);
        vn = d0 & hp;
    }
    for (int64_t i = 0; i < nused; i++) keys[used[i]] = EMPTY_KEY;
    return score;
}

/* Multi-word Myers: word arrays + explicit add/shift carries; identical
 * recurrence to the single-word form (and to the Python big-int fold). */
static int64_t myersW(const u32 *a, int64_t m, const u32 *b, int64_t n,
                      u64 *peq, u32 *keys, int64_t tmask, int64_t *used,
                      u64 *vp, u64 *vn, u64 *d0s, u64 *hps, u64 *hns) {
    int64_t W = (m + 63) >> 6;
    int64_t nused = 0;
    for (int64_t i = 0; i < m; i++) {
        int64_t s = slot_for(keys, tmask, a[i]);
        if (keys[s] == EMPTY_KEY) {
            keys[s] = a[i];
            memset(peq + s * W, 0, (size_t)W * sizeof(u64));
            used[nused++] = s;
        }
        peq[s * W + (i >> 6)] |= 1ULL << (i & 63);
    }
    u64 topmask = (m & 63) ? ((1ULL << (m & 63)) - 1) : ~0ULL;
    for (int64_t bq = 0; bq < W - 1; bq++) vp[bq] = ~0ULL;
    vp[W - 1] = topmask;
    memset(vn, 0, (size_t)W * sizeof(u64));
    int64_t score = m;
    int hib = (int)((m - 1) & 63);

    for (int64_t j = 0; j < n; j++) {
        int64_t s = slot_for(keys, tmask, b[j]);
        const u64 *eqrow = (keys[s] == EMPTY_KEY) ? NULL : peq + s * W;
        u64 carry = 0;
        for (int64_t bq = 0; bq < W; bq++) {
            u64 eq = eqrow ? eqrow[bq] : 0;
            u64 pvb = vp[bq], mvb = vn[bq];
            u64 x = eq & pvb;
            u64 t1 = x + pvb;
            u64 c1 = t1 < x;
            u64 t2 = t1 + carry;
            u64 c2 = t2 < t1;
            u64 d0 = (t2 ^ pvb) | eq | mvb;
            hps[bq] = mvb | ~(d0 | pvb);
            hns[bq] = d0 & pvb;
            d0s[bq] = d0;
            carry = c1 | c2;
        }
        score += (int64_t)((hps[W - 1] >> hib) & 1)
               - (int64_t)((hns[W - 1] >> hib) & 1);
        u64 hpc = 1, hnc = 0;
        for (int64_t bq = 0; bq < W; bq++) {
            u64 hp = hps[bq], hn = hns[bq];
            u64 nhpc = hp >> 63, nhnc = hn >> 63;
            hp = (hp << 1) | hpc;
            hn = (hn << 1) | hnc;
            hpc = nhpc; hnc = nhnc;
            if (bq == W - 1) { hp &= topmask; hn &= topmask; }
            u64 d0 = d0s[bq];
            u64 nvp = hn | ~(d0 | hp);
            if (bq == W - 1) nvp &= topmask;
            vp[bq] = nvp;
            vn[bq] = d0 & hp;
        }
    }
    for (int64_t i = 0; i < nused; i++) keys[used[i]] = EMPTY_KEY;
    return score;
}

/* Batch entry: UTF-32 code units concatenated per side, exclusive-end
 * offsets (aoff[i-1]..aoff[i], with aoff[-1] == 0 implied via i==0).
 * Returns 0 on success, nonzero on allocation failure. */
int64_t myers_batch(const u32 *abuf, const int64_t *aoff,
                    const u32 *bbuf, const int64_t *boff,
                    int64_t npairs, int64_t *out) {
    int64_t maxm = 1;
    for (int64_t i = 0; i < npairs; i++) {
        int64_t la = aoff[i] - (i ? aoff[i - 1] : 0);
        int64_t lb = boff[i] - (i ? boff[i - 1] : 0);
        int64_t mm = la < lb ? la : lb;
        if (mm > maxm) maxm = mm;
    }
    int64_t W = (maxm + 63) >> 6;
    int64_t tsize = 64;
    while (tsize < 2 * maxm && tsize < (1LL << 30)) tsize <<= 1;
    int64_t tmask = tsize - 1;
    u64 *peq = malloc((size_t)(tsize * W + 5 * W) * sizeof(u64));
    u32 *keys = malloc((size_t)tsize * sizeof(u32));
    int64_t *used = malloc((size_t)maxm * sizeof(int64_t));
    if (!peq || !keys || !used) { free(peq); free(keys); free(used); return 1; }
    memset(keys, 0xFF, (size_t)tsize * sizeof(u32));
    u64 *vp = peq + tsize * W, *vn = vp + W, *d0s = vn + W,
        *hps = d0s + W, *hns = hps + W;

    for (int64_t i = 0; i < npairs; i++) {
        int64_t a0 = i ? aoff[i - 1] : 0, b0 = i ? boff[i - 1] : 0;
        const u32 *a = abuf + a0, *b = bbuf + b0;
        int64_t la = aoff[i] - a0, lb = boff[i] - b0;
        if (la > lb) { const u32 *t = a; a = b; b = t;
                       int64_t tl = la; la = lb; lb = tl; }
        if (la == 0) { out[i] = lb; continue; }
        if (la == lb && memcmp(a, b, (size_t)la * sizeof(u32)) == 0) {
            out[i] = 0; continue;
        }
        out[i] = (la <= 64)
            ? myers1(a, la, b, lb, peq, keys, tmask, used)
            : myersW(a, la, b, lb, peq, keys, tmask, used, vp, vn, d0s, hps, hns);
    }
    free(peq); free(keys); free(used);
    return 0;
}
"""

# Pinned self-check battery (ran at load; any mismatch vs the pure-Python
# reference disables the kernel): ASCII, unicode incl. astral plane, empty,
# equal, single-word and multi-word patterns, repeated chars.
_CHECK_CASES = [
    ("", ""),
    ("", "abc"),
    ("kitten", "sitting"),
    ("flaw", "lawn"),
    ("a" * 70, "a" * 70),
    ("a" * 70 + "b", "a" * 71),
    ("abcd" * 40, "abdc" * 40),
    ("naïve café", "naive cafe"),
    ("𝔘𝔫𝔦𝔠𝔬𝔡𝔢", "Unicode"),
    ("x" * 200 + "y" * 200, "y" * 200 + "x" * 200),
    ("the quick brown fox", "the quick brown fox jumps"),
]

_lib = None
_tried = False
_shipped = set()


def _so_name() -> str:
    src_hash = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    return f"prp_lev_{src_hash}.so"


def _cache_dir() -> str:
    """Per-user mode-0700 cache directory for the compiled kernel. Never
    the shared system temp dir: a predictable name there would let another
    local user pre-plant a .so whose constructors run before the
    self-check (CDLL loads first, checks after)."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "prp_lev")
    os.makedirs(d, mode=0o700, exist_ok=True)
    return d


def _owned_and_private(path: str) -> bool:
    """True iff ``path`` is a regular file owned by the current euid and
    not writable by group or other — the precondition for loading it."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    return (
        os.path.isfile(path)
        and st.st_uid == os.geteuid()
        and not (st.st_mode & 0o022)
    )


def _on_worker() -> bool:
    """True when this process is a Spark executor-side Python worker —
    where the compiler must never run (guide §4.5 posture: heavyweight
    setup belongs on the driver, shipped once)."""
    try:
        from pyspark import SparkFiles

        return bool(SparkFiles._is_running_on_worker)
    except Exception:
        return False


def _sparkfiles_so():
    """The addFile-distributed copy of the kernel, if this process can see
    one (executor fetch dir, or the driver's own addFile root)."""
    try:
        from pyspark import SparkFiles

        p = SparkFiles.get(_so_name())
        if _owned_and_private(p):
            return p
    except Exception:
        pass
    return None


def _ensure_compiled() -> str:
    """Compile (or reuse) the kernel .so in the per-user cache; returns its
    path. Driver/standalone processes only; raises on any failure."""
    cache = _cache_dir()
    so_path = os.path.join(cache, _so_name())
    if _owned_and_private(so_path):
        return so_path
    if os.path.exists(so_path):
        os.unlink(so_path)  # wrong owner/mode: refuse to load, rebuild
    c_path = os.path.join(cache, f"{_so_name()}.{os.getpid()}.c")
    tmp_so = os.path.join(cache, f"{_so_name()}.{os.getpid()}.tmp")
    with open(c_path, "w") as f:
        f.write(_C_SOURCE)
    try:
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.chmod(tmp_so, 0o500)
        os.replace(tmp_so, so_path)  # atomic publish vs racing processes
    finally:
        for p in (c_path, tmp_so):
            try:
                os.unlink(p)
            except OSError:
                pass
    if not _owned_and_private(so_path):
        raise OSError(f"kernel cache file failed ownership check: {so_path}")
    return so_path


def _load_lib(so_path: str):
    lib = ctypes.CDLL(so_path)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.myers_batch.argtypes = [u32p, i64p, u32p, i64p, ctypes.c_int64, i64p]
    lib.myers_batch.restype = ctypes.c_int64
    return lib


def _locate_so():
    """Best .so this process may load WITHOUT compiling: the
    SparkFiles-distributed copy first, then the per-user cache (covers
    local mode, where driver and workers share the host and user)."""
    p = _sparkfiles_so()
    if p is not None:
        return p
    cached = os.path.join(_cache_dir(), _so_name())
    if _owned_and_private(cached):
        return cached
    return None


def ensure_kernel_shipped(spark=None) -> None:
    """Driver-side: compile (or reuse) the kernel and register it with the
    session via ``addFile`` so executors load it without ever invoking a
    compiler. Failure is non-fatal — workers then find no .so and the
    boundary runs the pure-Python path."""
    try:
        if _on_worker():
            return
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        if spark is None:
            return
        so_path = _ensure_compiled()
        sc = spark.sparkContext
        key = (sc.applicationId, so_path)
        if key in _shipped:
            return
        sc.addFile(so_path)
        _shipped.add(key)
    except Exception:
        pass


def _batch_with(lib, a_strs, b_strs):
    """Run the kernel over aligned string lists; returns a list of ints."""
    import numpy as np

    n = len(a_strs)
    if n == 0:
        return []
    a_enc = [s.encode("utf-32-le") for s in a_strs]
    b_enc = [s.encode("utf-32-le") for s in b_strs]
    abuf = np.frombuffer(b"".join(a_enc), dtype=np.uint32)
    bbuf = np.frombuffer(b"".join(b_enc), dtype=np.uint32)
    aoff = np.cumsum(
        np.fromiter((len(e) >> 2 for e in a_enc), dtype=np.int64, count=n)
    )
    boff = np.cumsum(
        np.fromiter((len(e) >> 2 for e in b_enc), dtype=np.int64, count=n)
    )
    out = np.empty(n, dtype=np.int64)
    # Zero-length buffers: numpy's ctypes pointer is NULL-safe here because
    # the C side never dereferences past the offsets, but keep a 1-element
    # dummy so the pointer is always valid.
    if abuf.size == 0:
        abuf = np.zeros(1, dtype=np.uint32)
    if bbuf.size == 0:
        bbuf = np.zeros(1, dtype=np.uint32)
    rc = lib.myers_batch(
        abuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        aoff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        boff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise MemoryError("myers_batch allocation failure")
    return out.tolist()


def get_kernel():
    """The loaded, self-checked kernel library, or ``None`` (pure-Python
    fallback). Process-cached; safe under Spark's reused Python workers
    because this module is importable (never pickled by value). Executor
    workers only LOAD (SparkFiles copy or per-user cache) — the compiler
    runs solely on the driver / standalone processes."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        so_path = _locate_so()
        if so_path is None:
            if _on_worker():
                _lib = None  # never compile in the executor path
                return _lib
            so_path = _ensure_compiled()
        lib = _load_lib(so_path)
        from .text import _myers_edit_distance

        a_side = [a for a, _ in _CHECK_CASES]
        b_side = [b for _, b in _CHECK_CASES]
        got = _batch_with(lib, a_side, b_side)
        want = [_myers_edit_distance(a, b) for a, b in _CHECK_CASES]
        if got != want:
            raise AssertionError(f"kernel self-check mismatch: {got} != {want}")
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def lev_batch(a_strs, b_strs):
    """Batch edit distances via the native kernel, or ``None`` when the
    kernel is unavailable (caller falls back to pure Python)."""
    lib = get_kernel()
    if lib is None:
        return None
    return _batch_with(lib, a_strs, b_strs)
