"""Mergeable sketches: HyperLogLog approximate count-distinct.

No sketch exists in the reference (SURVEY.md §2.6); at 100 TB an exact
``count(distinct)`` is an all-to-all of every key, while a sketch is one
4-KB register array per batch merged associatively — the canonical
pre-aggregation pattern (guide: "emit one serialized sketch per batch and
merge them in a second, tiny stage").

Standard HLL (Flajolet et al. 2007, public algorithm): p-bit bucket index,
max leading-zero rank per bucket, harmonic-mean estimate with small/large
range corrections.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..kernels.ids import stable_int


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HyperLogLog:
    """Dense HLL with 2**p registers (p=12 → ~1.6% relative error, 4 KB)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized insert of 63-bit hashes."""
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(63 - self.p)).astype(np.int64)  # top p bits
        rest = (h << np.uint64(self.p + 1)) >> np.uint64(self.p + 1)  # low 63-p bits
        # rank = leading zeros of the remaining bits + 1
        width = 63 - self.p
        nz = rest != 0
        ranks = np.full(h.shape[0], width + 1, dtype=np.uint8)
        if nz.any():
            bits = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
            ranks[nz] = (width - bits).astype(np.uint8)
        np.maximum.at(self.registers, idx, ranks)

    def add_values(self, values) -> None:
        self.add_hashes(
            np.fromiter((stable_int(str(v)) for v in values), dtype=np.uint64, count=len(values))
        )

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        est = _alpha(self.m) * m * m / np.power(2.0, -self.registers.astype(np.float64)).sum()
        if est <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(data, dtype=np.uint8).copy())


def approx_distinct(
    ds: ray.data.Dataset, column: str, by: str | None = None, p: int = 12
) -> ray.data.Dataset:
    """Approximate distinct count of ``column`` (optionally per ``by`` group).

    One sketch per (group, batch) leaves the map stage; a tiny groupby merges
    registers. Result: ``(by?, approx_distinct: int64)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        groups: dict = {}
        keys = batch[by].to_pylist() if by else [""] * batch.num_rows
        vals = batch[column].to_pylist()
        for k, v in zip(keys, vals):
            groups.setdefault(k, []).append(v)
        out_k, out_s = [], []
        for k, vs in groups.items():
            h = HyperLogLog(p)
            h.add_values(vs)
            out_k.append(k)
            out_s.append(h.to_bytes())
        t = {"sketch": pa.array(out_s, pa.binary())}
        if by:
            t[by] = pa.array(out_k, batch[by].type)
        else:
            t["__g"] = pa.array(out_k, pa.string())
        return pa.table(t)

    key = by if by else "__g"

    def reduce_group(group: pa.Table) -> pa.Table:
        acc = HyperLogLog(p)
        for blob in group["sketch"].to_pylist():
            acc = acc.merge(HyperLogLog.from_bytes(blob, p))
        t = {"approx_distinct": pa.array([int(round(acc.estimate()))], pa.int64())}
        if by:
            t = {by: group[by].slice(0, 1), **t}
        return pa.table(t)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(reduce_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------- Count-Min


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public algorithm):
    ``depth`` hash rows × ``width`` int64 counters; ``estimate(x) =
    min_r counters[r][h_r(x)]`` — never an underestimate, overestimate
    bounded by ``e·N/width`` with probability ``1 − e^{-depth}``.

    Merge is elementwise addition — the canonical mergeable-sketch shape:
    one ``depth × width`` array per batch crosses the exchange, never the
    keys. Row hashes are md5-prefix derived (``md5(f"{row}:{key}")``), the
    repo-wide SQL-matching convention, so the ENTIRE sketch rebuilds
    bit-exactly in DuckDB (the ``q_countmin_grams`` oracle)."""

    def __init__(self, depth: int = 4, width: int = 1 << 12,
                 counters: np.ndarray | None = None) -> None:
        self.depth = depth
        self.width = width
        self.counters = (
            counters
            if counters is not None
            else np.zeros((depth, width), dtype=np.int64)
        )

    @staticmethod
    def _buckets(keys: np.ndarray, depth: int, width: int) -> np.ndarray:
        """(len(keys), depth) bucket indices — md5 once per DISTINCT
        (row, key); SQL: ``('0x'||substr(md5(r||':'||k),1,12))::UBIGINT % w``."""
        import hashlib

        out = np.empty((len(keys), depth), dtype=np.int64)
        for ki, k in enumerate(keys):
            for r in range(depth):
                out[ki, r] = (
                    int(hashlib.md5(f"{r}:{k}".encode("utf-8")).hexdigest()[:12], 16)
                    % width
                )
        return out

    def add(self, keys: np.ndarray, counts: np.ndarray) -> None:
        """Add ``counts[i]`` occurrences of ``keys[i]`` (keys need not be
        unique; callers should pre-aggregate per batch)."""
        if len(keys) == 0:
            return
        b = self._buckets(keys, self.depth, self.width)
        for r in range(self.depth):
            np.add.at(self.counters[r], b[:, r], counts)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.counters += other.counters
        return self

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.empty(0, dtype=np.int64)
        b = self._buckets(keys, self.depth, self.width)
        ests = np.stack(
            [self.counters[r][b[:, r]] for r in range(self.depth)], axis=1
        )
        return ests.min(axis=1)

    def to_bytes(self) -> bytes:
        return self.counters.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, depth: int = 4, width: int = 1 << 12) -> "CountMinSketch":
        return cls(depth, width, np.frombuffer(data, np.int64).reshape(depth, width).copy())


def countmin_ngrams(
    ds: ray.data.Dataset,
    text_column: str = "text",
    k: int = 3,
    depth: int = 4,
    width: int = 1 << 12,
) -> CountMinSketch:
    """Build one corpus-wide Count-Min sketch of word k-gram frequencies:
    per-batch partial sketches (each batch pre-aggregates its DISTINCT grams
    before hashing) merged by addition — ``depth × width × 8`` bytes per
    batch cross the exchange, never the gram stream. The same canonical gram
    definition as every other gram operator (``kernels.normalize.word_ngrams``
    incl. the short-doc fallback)."""
    from ..kernels.grams import explode_ngrams

    def partial(batch: pa.Table) -> pa.Table:
        _, grams = explode_ngrams(batch[text_column], k)
        cm = CountMinSketch(depth, width)
        if len(grams):
            import pandas as pd

            agg = (
                pd.Series(grams.to_pylist()).value_counts(sort=False)
            )
            cm.add(
                agg.index.to_numpy(dtype=object),
                agg.to_numpy(dtype=np.int64),
            )
        return pa.table({"sk": pa.array([cm.to_bytes()], pa.binary())})

    def combine(batch: pa.Table) -> pa.Table:
        cm = CountMinSketch(depth, width)
        for blob in batch["sk"].to_pylist():
            cm.merge(CountMinSketch.from_bytes(blob, depth, width))
        return pa.table({"sk": pa.array([cm.to_bytes()], pa.binary())})

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64)
        .take_all()
    )  # ≤ ceil(batches / 64) sketch rows — fixed-size each
    cm = CountMinSketch(depth, width)
    for r in rows:
        cm.merge(CountMinSketch.from_bytes(r["sk"], depth, width))
    return cm


# --------------------------------------------------------------- KLL quantiles


class KLLSketch:
    """Mergeable quantile sketch (Karnin-Lang-Liberty 2016 compactor stack,
    DETERMINISTIC alternating compaction) with a SELF-CERTIFIED rank-error
    bound.

    Level ``i`` holds values of weight ``2^i``; a full level sorts and keeps
    every other element (parity alternates per level, so consecutive
    compactions cancel bias), pushing the survivors up one level. Collapsing
    a weight-``w`` buffer shifts any rank by at most ``w``, so the sketch
    tracks ``err_bound = Σ 2^i`` over every compaction it ever performed —
    a worst-case (input-order- and adversary-independent) guarantee that
    travels through ``merge``. One sketch is O(k·log(n/k)) float64s however
    large the stream; only sketches cross the exchange.

    vs :func:`..functions.aggregates.exact_quantiles`: exact selection needs
    ``max_rounds`` streaming passes; the sketch answers ANY quantile after
    ONE pass within ±err_bound ranks — the profiler's 100-TB path.
    """

    def __init__(self, k: int = 512) -> None:
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.parity: list[int] = [0]
        self.n = 0
        self.err_bound = 0

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if self.levels[i].shape[0] <= self.k:
                i += 1
                continue
            arr = np.sort(self.levels[i])
            if arr.shape[0] % 2:
                # compact an even count; one element stays behind unperturbed
                self.levels[i], arr = arr[-1:], arr[:-1]
            else:
                self.levels[i] = np.empty(0, np.float64)
            kept = arr[self.parity[i] :: 2]
            self.parity[i] ^= 1
            self.err_bound += 1 << i
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
                self.parity.append(0)
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], kept])
            i += 1

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        # feed level 0 in ≤k-sized slices so buffers never balloon past 2k
        for s in range(0, v.shape[0], self.k):
            self.levels[0] = np.concatenate([self.levels[0], v[s : s + self.k]])
            self.n += int(min(self.k, v.shape[0] - s))
            self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        for i, lv in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.empty(0, np.float64))
                self.parity.append(0)
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self.err_bound += other.err_bound
        self._compress()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([lv for lv in self.levels]) if self.n else np.empty(0)
        wts = (
            np.concatenate(
                [np.full(lv.shape[0], 1 << i, np.int64) for i, lv in enumerate(self.levels)]
            )
            if self.n
            else np.empty(0, np.int64)
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        """Smallest retained value whose estimated rank reaches ceil(q·n)
        (the ``quantile_disc`` rule applied to the weighted sample)."""
        if not self.n:
            return float("nan")
        vals, wts = self._weighted()
        target = max(int(np.ceil(q * self.n)), 1)
        pos = int(np.searchsorted(np.cumsum(wts), target))
        return float(vals[min(pos, vals.shape[0] - 1)])

    def rank(self, value: float) -> int:
        """Estimated #elements ≤ value (within ±err_bound of the truth)."""
        vals, wts = self._weighted()
        return int(wts[: np.searchsorted(vals, value, side="right")].sum())

    def to_bytes(self) -> bytes:
        import struct as _struct

        head = _struct.pack("<qqqq", self.k, self.n, self.err_bound, len(self.levels))
        parts = [head, np.asarray(self.parity, np.int64).tobytes()]
        for lv in self.levels:
            parts.append(_struct.pack("<q", lv.shape[0]))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLLSketch":
        import struct as _struct

        k, n, err, nlev = _struct.unpack_from("<qqqq", blob, 0)
        sk = cls(k)
        sk.n, sk.err_bound = n, err
        pos = 32
        sk.parity = list(np.frombuffer(blob, np.int64, nlev, pos))
        pos += 8 * nlev
        sk.levels = []
        for _ in range(nlev):
            (cnt,) = _struct.unpack_from("<q", blob, pos)
            pos += 8
            sk.levels.append(np.frombuffer(blob, np.float64, cnt, pos).copy())
            pos += 8 * cnt
        return sk


def kll_quantiles(
    ds: "ray.data.Dataset",
    column: str,
    qs: "list[float]",
    k: int = 512,
    combine_fanin: int = 128,
) -> pa.Table:
    """ONE-pass distributed quantiles via per-block KLL sketches and a
    tree combine (same 128:1 reduction shape as ``stages/pca.py``): each
    block emits one serialized sketch row; rounds of ``map_batches`` merges
    shrink the sketch table until the driver folds ≤``combine_fanin`` of
    them. Returns ``pa.Table (q, value, err_bound, n)`` — ``err_bound`` is
    the sketch's own worst-case rank-error certificate for this exact run.
    """

    def partial(batch: pa.Table) -> pa.Table:
        sk = KLLSketch(k)
        sk.update(batch[column].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.binary())})

    def combine(batch: pa.Table) -> pa.Table:
        sk = KLLSketch(k)
        for blob in batch["sk"].to_pylist():
            sk.merge(KLLSketch.from_bytes(blob))
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.binary())})

    cur = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).materialize()
    while cur.count() > combine_fanin:  # count() on materialized = metadata
        cur = cur.map_batches(
            combine, batch_format="pyarrow", batch_size=combine_fanin
        ).materialize()
    sk = KLLSketch(k)
    for row in cur.take_all():
        sk.merge(KLLSketch.from_bytes(row["sk"]))
    return pa.table(
        {
            "q": pa.array([float(q) for q in qs], pa.float64()),
            "value": pa.array([sk.quantile(q) for q in qs], pa.float64()),
            "err_bound": pa.array([sk.err_bound] * len(qs), pa.int64()),
            "n": pa.array([sk.n] * len(qs), pa.int64()),
        }
    )
