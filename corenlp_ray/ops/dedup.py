"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All are Ray-Data-first: vectorized per-batch signature computation →
explode to (bucket, doc) rows → ``groupby`` bucket → candidate pairs →
verify → cluster. Hot-bucket guards cap the per-bucket pair blowup (the
skew defusal for boilerplate-heavy web corpora). Signatures use
numpy-vectorized universal hashing over a single 64-bit base hash per
shingle — deterministic across runs/processes (no Python ``hash``).
"""
from __future__ import annotations

import hashlib
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from corenlp_ray.ops.textstats import fingerprint_batch

_MERSENNE = (1 << 61) - 1
_MAX_BUCKET = 64  # hot-bucket cap: pairs per bucket bounded by cap^2


# -------------------------------------------------------------- exact ----

def exact_dedup(docs_ds):
    """Exact dedup: md5(text) groupby → canonical = min(doc_id), count.

    Output: text_hash, canonical_doc_id, dup_count (sorted consumers can
    rely on unique text_hash). Oracle-SQL expressible."""
    from ray.data.aggregate import Count, Min

    hashed = docs_ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return (hashed
            .groupby("text_hash")
            .aggregate(Min("doc_id", alias_name="canonical_doc_id"),
                       Count(alias_name="dup_count")))


# ------------------------------------------------------------- minhash ----

def _base_hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _shingles(text: str, k: int = 3) -> List[str]:
    toks = (text or "").lower().split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    # odd multipliers → bijective multiply-shift hashing mod 2^64
    a = (rng.randint(1, 1 << 62, size=num_perm).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int = 64, k: int = 3,
                      _cache={}) -> np.ndarray:
    """num_perm-wide MinHash signature via multiply-shift universal hashes
    (a*h+b mod 2^64, numpy uint64 overflow — fully vectorized) over
    md5-derived 64-bit shingle hashes. Deterministic across
    runs/processes."""
    if num_perm not in _cache:
        _cache[num_perm] = _perm_params(num_perm)
    a, b = _cache[num_perm]
    sh = _shingles(text, k)
    if not sh:
        return np.zeros(num_perm, dtype=np.uint64)
    H = np.array([_base_hash64(s) for s in sh], dtype=np.uint64)
    with np.errstate(over="ignore"):
        M = a[:, None] * H[None, :] + b[:, None]  # uint64 wraparound
    return M.min(axis=1)


def _minhash_bands_batch(batch: pa.Table, num_perm: int, bands: int,
                         k: int) -> pa.Table:
    """docs batch → exploded (band_id, band_hash, doc_id) rows."""
    r = num_perm // bands
    band_ids, band_hashes, doc_ids = [], [], []
    ids = batch.column("doc_id").to_pylist()
    for doc_id, text in zip(ids, batch.column("text").to_pylist()):
        sig = minhash_signature(text, num_perm, k)
        for bi in range(bands):
            chunk = sig[bi * r:(bi + 1) * r]
            bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            band_ids.append(bi)
            band_hashes.append(bh)
            doc_ids.append(doc_id)
    return pa.Table.from_pydict(
        {"band_id": band_ids, "band_hash": band_hashes, "doc_id": doc_ids},
        schema=pa.schema([("band_id", pa.int32()),
                          ("band_hash", pa.string()),
                          ("doc_id", pa.int64())]))


def _npartitions() -> int:
    try:
        import ray

        return max(8, 4 * int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 16


def _add_partition(batch: pa.Table, cols, npart: int) -> pa.Table:
    import zlib

    keys = zip(*(batch.column(c).to_pylist() for c in cols))
    part = [zlib.crc32("|".join(map(str, k)).encode()) % npart for k in keys]
    return batch.append_column("_part", pa.array(part, type=pa.int32()))


def partitioned_group_apply(ds, key_cols, inner, npart=None):
    """Scale-shaped groupby for MANY tiny groups: hash-partition the key
    space into ~4×CPU coarse partitions (one Ray group each), then a
    vectorized pandas groupby INSIDE each partition. Avoids
    per-tiny-group Python dispatch (the map_groups-per-bucket trap)."""
    npart = npart or _npartitions()
    parted = ds.map_batches(lambda b: _add_partition(b, key_cols, npart),
                            batch_format="pyarrow")

    def run(part_df: pd.DataFrame) -> pd.DataFrame:
        out = [inner(g) for _, g in part_df.groupby(list(key_cols),
                                                    sort=False)]
        out = [o for o in out if len(o)]
        if not out:
            return inner(part_df.iloc[0:0])
        return pd.concat(out, ignore_index=True)

    return parted.groupby("_part").map_groups(run, batch_format="pandas")


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(group["doc_id"].tolist()))[:_MAX_BUCKET]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b})


def minhash_lsh_pairs(docs_ds, num_perm: int = 64, bands: int = 16,
                      k: int = 3):
    """docs → distinct LSH candidate pairs (doc_a < doc_b).

    shingle→minhash per batch → band explode → partitioned bucket
    groupby → within-bucket pairs (hot-bucket capped) → distinct."""
    exploded = docs_ds.map_batches(
        lambda b: _minhash_bands_batch(b, num_perm, bands, k),
        batch_format="pyarrow")
    pairs = partitioned_group_apply(
        exploded, ("band_id", "band_hash"), _bucket_pairs)
    from ray.data.aggregate import Count

    return (pairs.groupby(["doc_a", "doc_b"])
            .aggregate(Count(alias_name="n_bands")))


def minhash_dedup(docs_ds, num_perm: int = 64, bands: int = 16, k: int = 3,
                  threshold: float = 0.8):
    """Full near-dup pipeline: candidate pairs → signature-estimated
    Jaccard verify → connected components → (doc_id, cluster_id).

    The union-find runs on the driver over the VERIFIED pair set, which is
    provably small (pairs surviving a 0.8-Jaccard LSH at 16 bands are the
    true near-dup edges, a vanishing fraction of the corpus); the heavy
    work — signatures, banding, bucketing — is all distributed. Scale
    path for adversarial corpora: iterate min-label propagation via
    groupby instead (same edge dataset).
    """
    import ray

    pairs = minhash_lsh_pairs(docs_ds, num_perm, bands, k)
    # broadcast signatures for verification (vocabulary of candidate docs)
    cand_ids = set()
    pair_rows = []
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for da, db in zip(b.column("doc_a").to_pylist(),
                          b.column("doc_b").to_pylist()):
            cand_ids.add(da)
            cand_ids.add(db)
            pair_rows.append((da, db))
    if not pair_rows:
        return docs_ds.map_batches(
            lambda b: pa.Table.from_pydict(
                {"doc_id": b.column("doc_id"),
                 "cluster_id": b.column("doc_id")}),
            batch_format="pyarrow")
    cand_ref = ray.put(cand_ids)

    def sigs_of_candidates(batch: pa.Table) -> pa.Table:
        cids = ray.get(cand_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = {"doc_id": [], "sig": []}
        for i, t in zip(ids, texts):
            if i in cids:
                rows["doc_id"].append(i)
                rows["sig"].append(minhash_signature(t, num_perm, k).tobytes())
        return pa.Table.from_pydict(rows, schema=pa.schema(
            [("doc_id", pa.int64()), ("sig", pa.binary())]))

    sig_map: Dict[int, np.ndarray] = {}
    for b in docs_ds.map_batches(sigs_of_candidates,
                                 batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for i, s in zip(b.column("doc_id").to_pylist(),
                        b.column("sig").to_pylist()):
            sig_map[i] = np.frombuffer(s, dtype=np.uint64)
    # verify + union-find
    parent: Dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for da, db in pair_rows:
        sa, sb = sig_map.get(da), sig_map.get(db)
        if sa is None or sb is None:
            continue
        est = float(np.mean(sa == sb))
        if est >= threshold:
            ra, rb = find(da), find(db)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    cluster = {d: find(d) for d in list(parent)}
    cl_ref = ray.put(cluster)

    def assign(batch: pa.Table) -> pa.Table:
        cl = ray.get(cl_ref)
        ids = batch.column("doc_id").to_pylist()
        return pa.Table.from_pydict(
            {"doc_id": ids, "cluster_id": [cl.get(i, i) for i in ids]},
            schema=pa.schema([("doc_id", pa.int64()),
                              ("cluster_id", pa.int64())]))

    return docs_ds.map_batches(assign, batch_format="pyarrow")


# ------------------------------------------------------------- simhash ----

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5-based token hashes)."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _base_hash64(t)
        bits = np.unpackbits(
            np.frombuffer(int(h).to_bytes(8, "big"), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    out = 0
    for bit in (acc > 0).astype(np.int64):
        out = (out << 1) | int(bit)
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    """+ simhash (uint64 as int64 bit-pattern) and 4 16-bit block keys
    (the Hamming-distance-≤3 candidate trick: near-dups share ≥1 block)."""
    hs, b0, b1, b2, b3 = [], [], [], [], []
    for t in batch.column("text").to_pylist():
        h = simhash64(t)
        hs.append(h - (1 << 64) if h >= (1 << 63) else h)
        b0.append((h >> 48) & 0xFFFF)
        b1.append((h >> 32) & 0xFFFF)
        b2.append((h >> 16) & 0xFFFF)
        b3.append(h & 0xFFFF)
    return (batch
            .append_column("simhash", pa.array(hs, type=pa.int64()))
            .append_column("sh_block0", pa.array(b0, type=pa.int32()))
            .append_column("sh_block1", pa.array(b1, type=pa.int32()))
            .append_column("sh_block2", pa.array(b2, type=pa.int32()))
            .append_column("sh_block3", pa.array(b3, type=pa.int32())))


def _simhash_explode(batch: pa.Table) -> pa.Table:
    """docs batch → (block_id, block_val, doc_id, simhash) rows (4/doc)."""
    sh = simhash_batch(batch)
    bid, bval, did, h = [], [], [], []
    ids = sh.column("doc_id").to_pylist()
    hs = sh.column("simhash").to_pylist()
    blocks = [sh.column(f"sh_block{i}").to_pylist() for i in range(4)]
    for r in range(len(ids)):
        for i in range(4):
            bid.append(i)
            bval.append(blocks[i][r])
            did.append(ids[r])
            h.append(hs[r])
    return pa.Table.from_pydict(
        {"block_id": bid, "block_val": bval, "doc_id": did, "simhash": h},
        schema=pa.schema([("block_id", pa.int32()),
                          ("block_val", pa.int32()),
                          ("doc_id", pa.int64()),
                          ("simhash", pa.int64())]))


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """SimHash near-dup pairs: explode the 4 16-bit blocks → ONE
    partitioned bucket groupby → within-bucket Hamming verify → min per
    pair (near-dups with Hamming ≤ 3 share at least one block)."""
    exploded = docs_ds.map_batches(_simhash_explode, batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_a": [], "doc_b": [], "hamming": []}
        recs = sorted(set(zip(group["doc_id"], group["simhash"])))[:_MAX_BUCKET]
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                x = (recs[i][1] ^ recs[j][1]) & ((1 << 64) - 1)
                d = bin(x).count("1")
                if d <= max_hamming and recs[i][0] != recs[j][0]:
                    rows["doc_a"].append(recs[i][0])
                    rows["doc_b"].append(recs[j][0])
                    rows["hamming"].append(d)
        return pd.DataFrame(rows)

    pairs = partitioned_group_apply(exploded, ("block_id", "block_val"),
                                    verify)
    from ray.data.aggregate import Min

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# ------------------------------------------------------- n-gram jaccard ----

def jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact k-shingle Jaccard similarity (the verify kernel)."""
    sa, sb = set(_shingles(a, k)), set(_shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


# --------------------------------------------------- embedding near-dup ----

def embedding_neardup_pairs(embeds_ds, threshold: float = 0.95,
                            num_planes: int = 16, seed: int = 11):
    """Near-dup pairs over an embedding column via random-hyperplane LSH
    buckets → within-bucket exact cosine verify.

    embeds_ds: (vec_id, embedding list<float>). The hyperplane matrix is
    seeded and regenerated per worker (tiny), not shipped."""
    def bucketize(batch: pa.Table) -> pa.Table:
        V = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        ids = batch.column("vec_id").to_pylist()
        if V.size == 0:
            return pa.Table.from_pydict(
                {"bucket": [], "vec_id": [], "vec": []},
                schema=pa.schema([("bucket", pa.int64()),
                                  ("vec_id", pa.int64()),
                                  ("vec", pa.list_(pa.float64()))]))
        rng = np.random.RandomState(seed)
        P = rng.randn(V.shape[1], num_planes)
        signs = (V @ P) > 0
        buckets = signs.dot(1 << np.arange(num_planes)).astype(np.int64)
        return pa.Table.from_pydict(
            {"bucket": buckets.tolist(), "vec_id": ids, "vec": V.tolist()},
            schema=pa.schema([("bucket", pa.int64()),
                              ("vec_id", pa.int64()),
                              ("vec", pa.list_(pa.float64()))]))

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        ids = group["vec_id"].tolist()[:_MAX_BUCKET]
        V = np.array(group["vec"].tolist()[:_MAX_BUCKET], dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        Vn = V / norms[:, None]
        S = Vn @ Vn.T
        rows = {"vec_a": [], "vec_b": [], "cosine": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if S[i, j] >= threshold and ids[i] != ids[j]:
                    a, b = sorted((ids[i], ids[j]))
                    rows["vec_a"].append(a)
                    rows["vec_b"].append(b)
                    rows["cosine"].append(float(S[i, j]))
        return pd.DataFrame(rows)

    buckets = embeds_ds.map_batches(bucketize, batch_format="pyarrow")
    pairs = partitioned_group_apply(buckets, ("bucket",), verify)
    from ray.data.aggregate import Max

    return pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Max("cosine", alias_name="cosine"))
