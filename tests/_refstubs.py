"""Stubs that let the ACTUAL reference modules import and run in this
sandbox (their deps — bitarray, xxhash, datasets, tqdm, rich — are not
installed here).

The point is to EXECUTE the reference's own code, so the stubs are kept
as thin as possible:

- ``bitarray``: a faithful pure-Python re-implementation of the subset
  the reference's simhash.py uses (MSB-first bit order, elementwise
  shifts toward index 0, slice assignment, frombytes/tobytes/pack,
  util.int2ba/ba2int/urandom).  Its semantics are validated two ways in
  tests/test_reference_executed_kernels.py: against an independent
  list-of-bits model on randomized operations, and against the
  reference's own embedded doctest vectors (the compute() golden
  74633958390507528, the hamming examples).
- ``xxhash``: backed by this repo's spec-ported kernels
  (`kernel/xxh.py` xxh64_digest / xxh3_128_digest, both golden-pinned to
  the published XXH test vectors and to ``python-xxhash``'s big-endian
  ``digest()`` byte order).
- ``datasets`` / ``tqdm``: import-time no-ops (the reference only calls
  them in its ``__main__`` I/O path, which these tests do not run).
- ``text_dedup`` package: a synthesized package whose ``utils`` exposes
  the REAL reference files (`utils/union_find.py`,
  `utils/tokenization.py`, loaded by path) plus no-op arg-builder and
  Timer shims; ``logger`` is a plain stdlib logger (the real one only
  adds a rich handler).
"""

from __future__ import annotations

import importlib.util
import logging
import random as _random
import sys
import types

REFERENCE_ROOT = "/root/reference/text_dedup"


# ---------------------------------------------------------------------------
# bitarray stub: MSB-first, value held as an int where array index 0 is the
# most significant bit of ``_v`` (width ``_n``).
# ---------------------------------------------------------------------------


class bitarray:
    __slots__ = ("_v", "_n")

    def __init__(self, arg=None, buffer=None):
        if buffer is not None:
            self._n = 8 * len(buffer)
            self._v = int.from_bytes(buffer, "big")
            return
        if arg is None:
            self._v, self._n = 0, 0
        elif isinstance(arg, int):
            self._v, self._n = 0, arg
        elif isinstance(arg, str):
            bits = arg.replace(" ", "")
            self._n = len(bits)
            self._v = int(bits, 2) if bits else 0
        elif isinstance(arg, bitarray):
            self._v, self._n = arg._v, arg._n
        else:  # iterable of 0/1
            bits = [1 if b else 0 for b in arg]
            self._n = len(bits)
            self._v = int("".join(map(str, bits)), 2) if bits else 0

    # -- helpers ----------------------------------------------------------
    @property
    def _mask(self) -> int:
        return (1 << self._n) - 1

    def _check(self, other: "bitarray"):
        if self._n != other._n:
            raise ValueError("bitarray size mismatch")

    # -- content ----------------------------------------------------------
    def setall(self, value) -> None:
        self._v = self._mask if value else 0

    def frombytes(self, data: bytes) -> None:
        self._v = (self._v << (8 * len(data))) | int.from_bytes(data, "big")
        self._n += 8 * len(data)

    def tobytes(self) -> bytes:
        nbytes = (self._n + 7) // 8
        pad = 8 * nbytes - self._n  # real bitarray zero-pads at the END
        return (self._v << pad).to_bytes(nbytes, "big")

    def pack(self, data: bytes) -> None:
        # one bit appended per BYTE of ``data`` (bitarray.pack contract)
        for byte in data:
            self._v = (self._v << 1) | (1 if byte else 0)
            self._n += 1

    def tolist(self):
        return [(self._v >> (self._n - 1 - i)) & 1 for i in range(self._n)]

    def count(self, value=1) -> int:
        ones = bin(self._v).count("1")
        return ones if value else self._n - ones

    # -- indexing ---------------------------------------------------------
    def _posrange(self, sl: slice):
        return range(*sl.indices(self._n))

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            out = bitarray(0)
            for i in self._posrange(idx):
                out._v = (out._v << 1) | ((self._v >> (self._n - 1 - i)) & 1)
                out._n += 1
            return out
        if idx < 0:
            idx += self._n
        return (self._v >> (self._n - 1 - idx)) & 1

    def __setitem__(self, idx, value):
        positions = self._posrange(idx) if isinstance(idx, slice) else [idx]
        for i in positions:
            if i < 0:
                i += self._n
            bit = 1 << (self._n - 1 - i)
            if value:
                self._v |= bit
            else:
                self._v &= ~bit

    # -- operators (elementwise; shifts move toward index 0 for <<) --------
    def __and__(self, other):
        self._check(other)
        return _from_int(self._v & other._v, self._n)

    def __or__(self, other):
        self._check(other)
        return _from_int(self._v | other._v, self._n)

    def __xor__(self, other):
        self._check(other)
        return _from_int(self._v ^ other._v, self._n)

    def __ior__(self, other):
        self._check(other)
        self._v |= other._v
        return self

    def __lshift__(self, n: int):
        return _from_int((self._v << n) & self._mask, self._n)

    def __rshift__(self, n: int):
        return _from_int(self._v >> n, self._n)

    def __eq__(self, other):
        return (
            isinstance(other, bitarray)
            and self._n == other._n
            and self._v == other._v
        )

    def __len__(self):
        return self._n

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"bitarray('{format(self._v, f'0{self._n}b') if self._n else ''}')"


def _from_int(v: int, n: int) -> "bitarray":
    out = bitarray(n)
    out._v = v
    return out


class frozenbitarray(bitarray):
    def __hash__(self):
        return hash((self._n, self._v))


def _int2ba(value: int, length: int | None = None) -> bitarray:
    if length is None:
        length = max(1, value.bit_length())
    return _from_int(value, length)


def _ba2int(ba: bitarray) -> int:
    return ba._v


def _urandom(n: int) -> bitarray:
    return _from_int(_random.getrandbits(n) if n else 0, n)


# ---------------------------------------------------------------------------
# module installers
# ---------------------------------------------------------------------------


def _install_bitarray():
    if "bitarray" in sys.modules and not getattr(
        sys.modules["bitarray"], "__refstub__", False
    ):  # pragma: no cover - real package present
        return
    mod = types.ModuleType("bitarray")
    mod.__refstub__ = True
    mod.bitarray = bitarray
    mod.frozenbitarray = frozenbitarray
    util = types.ModuleType("bitarray.util")
    util.int2ba = _int2ba
    util.ba2int = _ba2int
    util.urandom = _urandom
    mod.util = util
    sys.modules["bitarray"] = mod
    sys.modules["bitarray.util"] = util


def _install_xxhash():
    if "xxhash" in sys.modules:
        return
    try:
        # Prefer the REAL python-xxhash package whenever it is installed,
        # even if nothing imported it yet — running the reference against
        # this repo's own xxh kernel would make the parity partially
        # circular in such an environment (ADVICE r3).
        importlib.import_module("xxhash")
        return
    except ImportError:
        pass
    from text_dedup_spark.kernel.xxh import xxh3_128_digest, xxh64_digest

    class _Digest:
        def __init__(self, data: bytes):
            self._data = data

        def digest(self) -> bytes:
            return self._data

        def intdigest(self) -> int:
            return int.from_bytes(self._data, "big")

    mod = types.ModuleType("xxhash")
    # marker so tests that want to compare against the REAL xxhash package
    # (tests/test_exact_and_simhash.py) can tell this substitute apart and
    # keep skipping — comparing the kernel against itself proves nothing.
    mod.__refstub__ = True
    mod.xxh64 = lambda obj, seed=0: _Digest(xxh64_digest(obj, seed))
    mod.xxh128 = lambda obj, seed=0: _Digest(xxh3_128_digest(obj, seed))
    sys.modules["xxhash"] = mod


class FakeDataset:
    """Minimal in-memory stand-in for the huggingface ``Dataset`` surface
    the reference's __main__ blocks touch: len, batched slicing returning
    a column dict, ``filter(fn, with_indices=True)``, ``save_to_disk``."""

    def __init__(self, columns: dict):
        self.columns = {k: list(v) for k, v in columns.items()}
        self.saved_to = None

    def __len__(self):
        lens = {len(v) for v in self.columns.values()}
        return lens.pop() if lens else 0

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return {k: v[idx] for k, v in self.columns.items()}
        return {k: v[idx] for k, v in self.columns.items()}

    def _rows(self):
        keys = list(self.columns)
        for i in range(len(self)):
            yield {k: self.columns[k][i] for k in keys}

    def filter(self, fn=None, with_indices=False, num_proc=None,
               function=None, **_kw):
        fn = fn if fn is not None else function  # positional or keyword
        keep = [
            fn(row, i) if with_indices else fn(row)
            for i, row in enumerate(self._rows())
        ]
        return FakeDataset(
            {k: [x for x, f in zip(v, keep) if f] for k, v in self.columns.items()}
        )

    @property
    def column_names(self):
        return list(self.columns)

    def remove_columns(self, names):
        if isinstance(names, str):
            names = [names]
        return FakeDataset(
            {k: v for k, v in self.columns.items() if k not in names}
        )

    def map(self, function, fn_kwargs=None, input_columns=None,
            remove_columns=None, with_indices=False, num_proc=None, **_kw):
        """The slice of ``Dataset.map`` the reference's __main__ blocks use
        (minhash.py:280-295,333-341): per-example fn, positional
        ``input_columns`` values (else the row dict), idx appended under
        ``with_indices``, returned dict MERGED over the row, then
        ``remove_columns`` dropped."""
        fn_kwargs = fn_kwargs or {}
        out_rows = []
        for i, row in enumerate(self._rows()):
            if input_columns is not None:
                args = [row[c] for c in input_columns]
            else:
                args = [row]
            if with_indices:
                args.append(i)
            merged = dict(row)
            merged.update(function(*args, **fn_kwargs))
            out_rows.append(merged)
        cols: dict = {k: [] for k in out_rows[0]} if out_rows else {}
        for r in out_rows:
            for k in cols:
                cols[k].append(r[k])
        ds = FakeDataset(cols)
        if remove_columns:
            ds = ds.remove_columns(remove_columns)
        return ds

    def save_to_disk(self, path):
        self.saved_to = path
        _DATASET_HOOK["saved"] = self


# tests place the dataset that ``datasets.load_dataset`` should hand the
# reference's __main__ here, and read the ``save_to_disk`` result back.
_DATASET_HOOK: dict = {}


def _install_misc():
    if "tqdm" not in sys.modules:
        t = types.ModuleType("tqdm")
        t.tqdm = lambda it=None, *a, **k: it
        sys.modules["tqdm"] = t
    if "datasets" not in sys.modules:
        d = types.ModuleType("datasets")
        d.logging = types.SimpleNamespace(set_verbosity_error=lambda: None)
        d.load_dataset = lambda *a, **k: _DATASET_HOOK.get("ds")
        d.load_from_disk = lambda *a, **k: _DATASET_HOOK.get("ds")
        d.Dataset = FakeDataset
        sys.modules["datasets"] = d


def _load_by_path(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    except BaseException:
        # Never cache a half-initialized module: a later call must re-raise
        # the real error, not surface confusing AttributeErrors (ADVICE r3).
        sys.modules.pop(name, None)
        raise
    return mod


def _install_text_dedup_pkg():
    if "text_dedup" in sys.modules:
        return
    pkg = types.ModuleType("text_dedup")
    pkg.__path__ = []
    pkg.logger = logging.getLogger("reference")
    sys.modules["text_dedup"] = pkg

    # the real reference files — all dependency-free
    uf = _load_by_path(
        "text_dedup.utils.union_find", f"{REFERENCE_ROOT}/utils/union_find.py"
    )
    tok = _load_by_path(
        "text_dedup.utils.tokenization", f"{REFERENCE_ROOT}/utils/tokenization.py"
    )
    add_args = _load_by_path(
        "text_dedup.utils.add_args", f"{REFERENCE_ROOT}/utils/add_args.py"
    )
    timer_mod = _load_by_path(
        "text_dedup.utils.timer", f"{REFERENCE_ROOT}/utils/timer.py"
    )

    utils = types.ModuleType("text_dedup.utils")
    utils.UnionFind = uf.UnionFind
    utils.ngrams = tok.ngrams
    for name in (
        "add_io_args",
        "add_meta_args",
        "add_minhash_args",
        "add_simhash_args",
        "add_sa_args",
        "add_exact_hash_args",
        "add_bloom_filter_args",
    ):
        setattr(utils, name, getattr(add_args, name))
    utils.timer = timer_mod
    utils.Timer = timer_mod.Timer
    pkg.utils = utils
    sys.modules["text_dedup.utils"] = utils


class ScalableBloomFilter:
    """Exact-set stand-in for ``pybloom_live.ScalableBloomFilter`` — the
    error_rate -> 0 limit of the real filter (zero false positives, the
    ``add`` returns-seen contract of bloom_filter.py:52-63).  This is the
    honest oracle surface: the reference ACCEPTS false-positive drops at
    its configured error rate, while this engine's Bloom path refuses them
    by construction (operators/bloom.py: a Bloom hit routes to an exact
    anti-join), so the FP-free limit is exactly the semantics on which the
    two implementations are defined to agree."""

    SMALL_SET_GROWTH = 2
    LARGE_SET_GROWTH = 4

    def __init__(self, initial_capacity=100, error_rate=0.001,
                 mode=SMALL_SET_GROWTH):
        self.initial_capacity = initial_capacity
        self.error_rate = error_rate
        self.mode = mode
        self._seen: set = set()

    def add(self, item) -> bool:
        seen = item in self._seen
        self._seen.add(item)
        return seen

    def __contains__(self, item) -> bool:
        return item in self._seen

    def __len__(self) -> int:
        return len(self._seen)


def _install_pybloom():
    if "pybloom_live" not in sys.modules:
        mod = types.ModuleType("pybloom_live")
        mod.__refstub__ = True
        mod.ScalableBloomFilter = ScalableBloomFilter
        sys.modules["pybloom_live"] = mod


def _install_rich():
    """rich.logging.RichHandler -> plain StreamHandler (the reference's
    text_dedup/__init__.py and minhash.py use it only to pretty-print)."""
    if "rich" not in sys.modules:
        r = types.ModuleType("rich")
        rl = types.ModuleType("rich.logging")

        class RichHandler(logging.StreamHandler):
            def __init__(self, *a, **_kw):  # swallow rich-only kwargs
                super().__init__()

        rl.RichHandler = RichHandler
        r.logging = rl
        sys.modules["rich"] = r
        sys.modules["rich.logging"] = rl


def _install_bare_utils():
    """The reference's single-node scripts import ``utils`` BARE (they are
    launched from inside text_dedup/); alias the real reference modules
    loaded by _install_text_dedup_pkg under those names."""
    if "utils" in sys.modules:
        return
    td_utils = sys.modules["text_dedup.utils"]
    u = types.ModuleType("utils")
    u.UnionFind = td_utils.UnionFind
    u.ngrams = td_utils.ngrams
    sys.modules["utils"] = u
    sys.modules["utils.add_args"] = sys.modules["text_dedup.utils"].__dict__.get(
        "add_args_module"
    ) or _load_by_path(
        "utils.add_args", f"{REFERENCE_ROOT}/utils/add_args.py"
    )
    sys.modules["utils.timer"] = _load_by_path(
        "utils.timer", f"{REFERENCE_ROOT}/utils/timer.py"
    )
    u.add_args = sys.modules["utils.add_args"]
    u.timer = sys.modules["utils.timer"]
    u.Timer = sys.modules["utils.timer"].Timer


def install_reference_stubs():
    _install_misc()
    _install_bitarray()
    _install_xxhash()
    _install_pybloom()
    _install_text_dedup_pkg()


def bitarray_impl():
    """Return the ``(bitarray, frozenbitarray, util)`` implementation the
    reference actually holds after stub install — the real package when it
    is importable, else the stub.  Tests must construct bit arrays through
    this (not by importing the stub classes directly) so test-side and
    reference-side instances always share ONE implementation; cross-type
    ``^``/``==`` between a real and a stub bitarray would silently compare
    unequal (ADVICE r3)."""
    install_reference_stubs()
    mod = sys.modules["bitarray"]
    return mod.bitarray, mod.frozenbitarray, sys.modules["bitarray.util"]


def load_reference_module(filename: str):
    """Import ``/root/reference/text_dedup/<filename>`` with stubs in place.

    The returned module is the reference's actual code object-for-object;
    only its import-time third-party deps are substituted.
    """
    install_reference_stubs()
    name = f"ref_{filename.removesuffix('.py')}"
    if name in sys.modules:
        return sys.modules[name]
    return _load_by_path(name, f"{REFERENCE_ROOT}/{filename}")
