"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference only deduplicates exactly, by content-hash id at insert time
(``image.py:627-628``) and via NMS for overlapping boxes (``nms.py:64-127``);
the approximate family here is the standard public toolkit a training-data
pipeline needs at 100 TB.

Scale notes (every op keeps ONE wide shuffle):

- exact:    hash column per batch → groupby(hash) → first-wins. Pre-hash makes
            the shuffle key small even for multi-MB texts.
- minhash:  per-batch signature (vectorized numpy) → explode to
            (band, band_hash, doc) rows → groupby band bucket → candidate
            pairs → verify exact Jaccard. Candidate verification broadcasts
            the shingle sets via ``ray.put`` (documents that collide in a band
            are a tiny fraction); at petabyte scale swap the broadcast for a
            bucketed self-join keyed by doc id.
- simhash:  64-bit signature, banded into 4x16-bit keys → same bucket shape;
            verify by Hamming distance.
- cosine:   random-hyperplane LSH bucket → within-bucket pairwise cosine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..kernels.ids import md5_hex, stable_int

# ---------------------------------------------------------------- exact dedup


def add_content_hash(batch: pa.Table, text_column: str = "text", out: str = "dedup_key") -> pa.Table:
    texts = batch[text_column].to_pylist()
    return batch.append_column(out, pa.array([md5_hex(t or "") for t in texts], pa.string()))


def dedup_exact(
    ds: ray.data.Dataset, text_column: str = "text", id_column: str = "doc_id"
) -> ray.data.Dataset:
    """First-wins exact dedup: smallest id per identical text survives.

    Returns columns ``(dedup_key, {id_column}, n_dups)`` — deterministic and
    SQL-oracle-friendly (``GROUP BY text``).
    """
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_column).select(["dedup_key", id_column]),
        batch_format="pyarrow",
    )

    def first_wins(group: pa.Table) -> pa.Table:
        ids = group[id_column]
        return pa.table(
            {
                "dedup_key": pa.array([group["dedup_key"][0].as_py()], pa.string()),
                id_column: pa.array([pc.min(ids).as_py()], ids.type),
                "n_dups": pa.array([group.num_rows], pa.int64()),
            }
        )

    return hashed.groupby("dedup_key").map_groups(first_wins, batch_format="pyarrow")


# ------------------------------------------------------------- minhash + LSH

_MERSENNE = (1 << 61) - 1


def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (uint64); falls back to whole-text hash for
    short docs so every doc has a signature."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.fromiter(
        (stable_int(g) for g in grams), dtype=np.uint64, count=len(grams)
    )


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized (a*x + b) mod p minwise signature, shape [num_hashes]."""
    # modular arithmetic in python ints would be slow; 61-bit prime keeps
    # products inside uint128-free range via split multiply on uint64
    x = sh.astype(np.uint64)
    out = np.empty(a.shape[0], dtype=np.uint64)
    for i in range(a.shape[0]):
        v = (x * a[i] + b[i]) % np.uint64(_MERSENNE)
        out[i] = v.min()
    return out


class MinHasher:
    """Actor: signature params built once; emits (band, band_key, id) rows."""

    def __init__(
        self,
        text_column: str = "text",
        id_column: str = "doc_id",
        num_hashes: int = 64,
        bands: int = 16,
        k: int = 3,
        seed: int = 7,
    ) -> None:
        assert num_hashes % bands == 0
        self._a, self._b = _hash_params(num_hashes, seed)
        self._rows_per_band = num_hashes // bands
        self._bands = bands
        self._k = k
        self._text_column = text_column
        self._id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self._text_column].to_pylist()
        ids = batch[self._id_column].to_pylist()
        band_ids: list[int] = []
        band_keys: list[str] = []
        out_ids: list = []
        r = self._rows_per_band
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(shingle_hashes(text or "", self._k), self._a, self._b)
            for band in range(self._bands):
                band_ids.append(band)
                band_keys.append(md5_hex(sig[band * r : (band + 1) * r].tobytes()))
                out_ids.append(doc_id)
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_key": pa.array(band_keys, pa.string()),
                self._id_column: pa.array(out_ids, batch[self._id_column].type),
            }
        )


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def dedup_minhash(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 7,
    verify: bool = True,
    max_bucket: int = 64,
) -> ray.data.Dataset:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    Returns ``(id_a, id_b, jaccard)`` with id_a < id_b, deduplicated across
    bands. ``verify=True`` broadcasts the doc→shingle-set map (``ray.put``
    once, read per actor) — swap for a bucketed join when the corpus doesn't
    fit the object store; the LSH part is unchanged.
    """
    buckets = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs=dict(
            text_column=text_column, id_column=id_column, num_hashes=num_hashes,
            bands=bands, k=k, seed=seed,
        ),
    )

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group[id_column].to_pylist())[:max_bucket]
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] != ids[j]:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        t = group[id_column].type
        return pa.table({"id_a": pa.array(a_out, t), "id_b": pa.array(b_out, t)})

    pairs = (
        buckets.groupby(["band", "band_key"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")  # cross-band dedup
    )
    if not verify:
        return pairs

    shingles = {
        r[id_column]: set(shingle_hashes(r[text_column] or "", k).tolist())
        for r in ds.select_columns([id_column, text_column]).take_all()
    }
    ref = ray.put(shingles)

    class Verify:
        def __init__(self) -> None:
            self._sets = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ja = [
                round(jaccard(self._sets[a], self._sets[b]), 6)
                for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist())
            ]
            batch = batch.append_column("jaccard", pa.array(ja, pa.float64()))
            return batch.filter(pc.greater_equal(batch["jaccard"], threshold))

    return pairs.map_batches(Verify, batch_format="pyarrow", concurrency=(1, 2))


# ------------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in toks:
        h = np.uint64(stable_int(tok, bits=63)) | (np.uint64(stable_int("~" + tok, bits=1)) << np.uint64(63))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def add_simhash(batch: pa.Table, text_column: str = "text") -> pa.Table:
    texts = batch[text_column].to_pylist()
    return batch.append_column(
        "simhash", pa.array([f"{simhash64(t or ''):016x}" for t in texts], pa.string())
    )


def dedup_simhash(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 64,
) -> ray.data.Dataset:
    """SimHash near-dup pairs: 4x16-bit band bucketing (any pair within
    Hamming distance 3 of 64 bits shares at least one exact 16-bit band),
    then exact Hamming verification."""

    def to_bands(batch: pa.Table) -> pa.Table:
        batch = add_simhash(batch, text_column)
        sims = batch["simhash"].to_pylist()
        ids = batch[id_column].to_pylist()
        band_ids, keys, out_ids, out_sims = [], [], [], []
        for i, s in zip(ids, sims):
            v = int(s, 16)
            for band in range(4):
                band_ids.append(band)
                keys.append((v >> (band * 16)) & 0xFFFF)
                out_ids.append(i)
                out_sims.append(s)
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_key": pa.array(keys, pa.int32()),
                id_column: pa.array(out_ids, batch[id_column].type),
                "simhash": pa.array(out_sims, pa.string()),
            }
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(zip(group[id_column].to_pylist(), group["simhash"].to_pylist()))[:max_bucket]
        a_o, b_o, d_o = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][0] == rows[j][0]:
                    continue
                dist = bin(int(rows[i][1], 16) ^ int(rows[j][1], 16)).count("1")
                if dist <= max_hamming:
                    a_o.append(rows[i][0])
                    b_o.append(rows[j][0])
                    d_o.append(dist)
        t = group[id_column].type
        return pa.table(
            {
                "id_a": pa.array(a_o, t),
                "id_b": pa.array(b_o, t),
                "hamming": pa.array(d_o, pa.int32()),
            }
        )

    return (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band", "band_key"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )


# ------------------------------------------------------- embedding near-dup


def dedup_embedding_cosine(
    ds: ray.data.Dataset,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 11,
    max_bucket: int = 256,
) -> ray.data.Dataset:
    """Random-hyperplane LSH bucket + within-bucket pairwise cosine ≥ τ.

    One shuffle keyed by the LSH signature. Hyperplanes are seeded numpy,
    identical on every worker (regenerated in the stage, no broadcast needed).
    """

    def to_buckets(batch: pa.Table) -> pa.Table:
        emb = np.asarray(batch[embedding_column].to_pylist(), dtype=np.float64)
        dim = emb.shape[1]
        h = np.random.RandomState(seed).standard_normal((dim, planes))
        signs = (emb @ h) > 0
        keys = (signs.astype(np.uint32) << np.arange(planes, dtype=np.uint32)).sum(1)
        return pa.table(
            {
                "bucket": pa.array(keys.astype(np.int64), pa.int64()),
                id_column: batch[id_column],
                embedding_column: batch[embedding_column],
            }
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_column].to_pylist()[:max_bucket]
        emb = np.asarray(group[embedding_column].to_pylist()[:max_bucket], dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        unit = emb / norms[:, None]
        cos = unit @ unit.T
        order = np.argsort(ids, kind="stable")
        a_o, b_o, c_o = [], [], []
        for oi in range(len(order)):
            for oj in range(oi + 1, len(order)):
                i, j = order[oi], order[oj]
                if ids[i] == ids[j]:
                    continue
                c = round(float(cos[i, j]), 6)
                if c >= threshold:
                    a_o.append(ids[i])
                    b_o.append(ids[j])
                    c_o.append(c)
        t = group[id_column].type
        return pa.table(
            {
                "id_a": pa.array(a_o, t),
                "id_b": pa.array(b_o, t),
                "cosine": pa.array(c_o, pa.float64()),
            }
        )

    return (
        ds.map_batches(to_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
