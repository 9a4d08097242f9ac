"""Broadcast-merged Bloom URL-seen filter (SURVEY.md F1/J1/A2).

Reference behavior: ``dep:scrapy.dupefilters::RFPDupeFilter.request_seen``
— an in-memory Python ``set`` of SHA1 request fingerprints, single
process. The north_rule names its replacement: "a broadcast-merged
Bloom/cuckoo URL-seen filter with canonicalized URL hashing".

Design (scale notes for 10^10 URLs):

- The Bloom is a **prefilter only** — correctness never depends on it.
  Every candidate that survives the Bloom is still checked by an exact
  ``left_anti`` join against the ``seen`` table, so false positives
  are impossible at the output and false negatives cannot occur
  (Bloom has none). The Bloom's job is to keep the anti-join's probe
  side small: at steady state most rediscovered URLs are dropped
  executor-side before any shuffle.
- **Mergeable partials**: each partition builds a local bit array over
  its ``url_hash`` values (``mapInPandas``, one row out per
  partition), the driver ORs them (Spark's Python API has no native
  tree-merging UDAF — documented in SURVEY.md §2.8) and re-broadcasts
  once per wave. Partial size == final size == m/8 bytes.
- **Sizing at 10^10**: a monolithic 1e10-key / 1%-fpp Bloom is ~12 GB
  — too big to broadcast. The intended cluster deployment shards the
  filter into B banks by ``url_hash`` prefix (``bank = url_hash >>>
  (64 - log2 B)``); each executor holds only the banks for its
  hash-partitioned frontier slice, so per-executor memory is m/B. The
  sandbox uses one bank; the bank math is pure arithmetic on the same
  structure. Raising fpp (the exact anti-join rescues correctness)
  trades broadcast size for anti-join traffic.
- Hashing: positions derive from the 64-bit ``xxhash64(url_canon)``
  via splitmix64 double hashing — no string re-hashing in Python.

All operations are vectorized numpy over Arrow batches.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & MASK64
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & MASK64
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & MASK64
        return z ^ (z >> np.uint64(31))


@dataclass
class BloomFilter:
    """Fixed-size mergeable Bloom over int64 keys."""

    bits: np.ndarray  # uint8 array of m/8 bytes
    n_hashes: int

    @classmethod
    def sized(cls, capacity: int, fpp: float = 0.01) -> "BloomFilter":
        m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        m = (m + 7) // 8 * 8
        k = max(1, round(m / max(capacity, 1) * math.log(2)))
        return cls(bits=np.zeros(m // 8, dtype=np.uint8), n_hashes=int(k))

    @property
    def m(self) -> int:
        return len(self.bits) * 8

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit positions via double hashing."""
        x = keys.astype(np.int64).view(np.uint64)
        h1 = _splitmix64_np(x)
        h2 = _splitmix64_np(h1) | np.uint64(1)
        ks = np.arange(self.n_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return ((h1[:, None] + ks[None, :] * h2[:, None]) & MASK64) % np.uint64(
                self.m
            )

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.bits, (pos >> 3).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys))
        byte = self.bits[(pos >> 3).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=1)

    @property
    def shape(self) -> tuple[int, int, int]:
        """(n_banks, bits-per-bank, n_hashes) — 1 bank for the
        monolithic flavor; comparable across flavors."""
        return (1, self.m, self.n_hashes)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if not isinstance(other, BloomFilter) or self.shape != other.shape:
            raise ValueError(
                f"cannot merge Bloom filters of different flavor/shape: "
                f"{self.shape} vs {getattr(other, 'shape', type(other))}"
            )
        return BloomFilter(bits=self.bits | other.bits, n_hashes=self.n_hashes)

    # -- checkpoint serialization (SURVEY §7.1 step 6)
    def to_bytes(self) -> bytes:
        return self.n_hashes.to_bytes(4, "little") + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        k = int.from_bytes(raw[:4], "little")
        return cls(bits=np.frombuffer(raw[4:], dtype=np.uint8).copy(), n_hashes=k)


_BANK_MAGIC = 0x42414E4B  # "BANK" — cannot collide with n_hashes (≤64)


@dataclass
class BankedBloomFilter:
    """Bank-sharded Bloom: B independent :class:`BloomFilter` banks,
    keys routed by the TOP log2(B) bits of the hash
    (``bank = url_hash >>> (64 - log2 B)`` — the north_rule's
    10^10-scale layout from the module docstring, now code).

    Why banks: a monolithic 1e10-key/1%-fpp filter is ~12 GB — too big
    to broadcast or hold per executor. With B banks each executor
    holds only the banks its hash-partitioned frontier slice routes to
    (m/B bytes per bank); partial build/merge/serialize all stay
    per-bank, so no single task or broadcast ever touches the full m
    bits. B=1 degenerates to the monolithic filter bit-for-bit.

    Same duck-typed surface as BloomFilter (add / might_contain /
    merge / to_bytes), so the crawl loop, dedup prefilter and
    checkpoints take either."""

    banks: list[BloomFilter]

    @classmethod
    def sized(cls, capacity: int, fpp: float = 0.01, n_banks: int = 4) -> "BankedBloomFilter":
        if n_banks < 1 or (n_banks & (n_banks - 1)):
            raise ValueError("n_banks must be a power of two")
        per_bank = max(1, capacity // n_banks)
        return cls([BloomFilter.sized(per_bank, fpp) for _ in range(n_banks)])

    @property
    def n_banks(self) -> int:
        return len(self.banks)

    def _bank_idx(self, keys: np.ndarray) -> np.ndarray:
        if self.n_banks == 1:
            return np.zeros(len(keys), dtype=np.int64)
        shift = np.uint64(64 - (self.n_banks.bit_length() - 1))
        u = keys.astype(np.int64).view(np.uint64)
        return (u >> shift).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys)
        if not len(keys):
            return
        idx = self._bank_idx(keys)
        for b in range(self.n_banks):
            m = idx == b
            if m.any():
                self.banks[b].add(keys[m])

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys)
        out = np.zeros(len(keys), dtype=bool)
        if not len(keys):
            return out
        idx = self._bank_idx(keys)
        for b in range(self.n_banks):
            m = idx == b
            if m.any():
                out[m] = self.banks[b].might_contain(keys[m])
        return out

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.n_banks, self.banks[0].m, self.banks[0].n_hashes)

    def merge(self, other: "BankedBloomFilter") -> "BankedBloomFilter":
        if not isinstance(other, BankedBloomFilter) or self.shape != other.shape:
            raise ValueError(
                f"cannot merge Bloom filters of different flavor/shape: "
                f"{self.shape} vs {getattr(other, 'shape', type(other))}"
            )
        return BankedBloomFilter(
            [a.merge(b) for a, b in zip(self.banks, other.banks)]
        )

    def to_bytes(self) -> bytes:
        parts = [
            _BANK_MAGIC.to_bytes(4, "little"),
            self.n_banks.to_bytes(4, "little"),
        ]
        for b in self.banks:
            raw = b.to_bytes()
            parts.append(len(raw).to_bytes(4, "little"))
            parts.append(raw)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BankedBloomFilter":
        if int.from_bytes(raw[:4], "little") != _BANK_MAGIC:
            raise ValueError("not a banked Bloom serialization (bad magic)")
        n = int.from_bytes(raw[4:8], "little")
        banks, off = [], 8
        for _ in range(n):
            ln = int.from_bytes(raw[off : off + 4], "little")
            off += 4
            banks.append(BloomFilter.from_bytes(raw[off : off + ln]))
            off += ln
        return cls(banks)


#: Either filter flavor — everything downstream is duck-typed.
AnyBloom = BloomFilter | BankedBloomFilter


def bloom_from_bytes(raw: bytes) -> "AnyBloom":
    """Deserialize any seen-filter flavor by magic header (banked
    Bloom, cuckoo, sharded cuckoo; a plain Bloom's first word is its
    n_hashes ≤ 64, which cannot collide with the magics)."""
    if len(raw) >= 4:
        magic = int.from_bytes(raw[:4], "little")
        if magic == _BANK_MAGIC:
            return BankedBloomFilter.from_bytes(raw)
        # lazy import: cuckoo imports _splitmix64_np from this module
        from wos_crawler_spark.operators import cuckoo as _ck

        if magic == _ck.CUCKOO_MAGIC:
            return _ck.CuckooFilter.from_bytes(raw)
        if magic == _ck.SHARD_MAGIC:
            return _ck.ShardedCuckooFilter.from_bytes(raw)
    return BloomFilter.from_bytes(raw)


def build_bloom(df: DataFrame, hash_col: str, capacity: int, fpp: float = 0.01) -> BloomFilter:
    """Distributed build: per-partition partial bit arrays (mapInPandas),
    OR-reduced **executor-side** (one shuffle of the fixed-size partials
    to a single merge task — the tree-merge documented in SURVEY §2.8),
    so exactly ONE m/8-byte array crosses to the driver, via Arrow.
    Driver traffic is O(m), independent of partition count."""
    proto = BloomFilter.sized(capacity, fpp)
    m_bytes, k = len(proto.bits), proto.n_hashes

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Set bits via boolean scatter-assignment + packbits instead of
        # np.bitwise_or.at: plain stores vectorize (~20x faster than
        # the unbuffered read-modify-write .at scatter at 10^7 keys).
        # Cost: one transient m-bit bool array (m BYTES) per task —
        # at 10^10-scale the bank sharding below shrinks it by B.
        proto_t = BloomFilter(bits=np.zeros(m_bytes, dtype=np.uint8), n_hashes=k)
        bits_bool = np.zeros(m_bytes * 8, dtype=bool)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                pos = proto_t._positions(pdf[hash_col].to_numpy())
                bits_bool[pos.ravel().astype(np.int64)] = True
        if any_rows:
            # packbits is MSB-first per byte; our bit index convention
            # is LSB-first (1 << (pos & 7)), so pack with bitorder
            # 'little' to match might_contain/add.
            packed = np.packbits(bits_bool, bitorder="little")
            yield pd.DataFrame({"bits": [packed.tobytes()]})

    def _reduce(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: np.ndarray | None = None
        for pdf in batches:
            for raw in pdf["bits"]:
                a = np.frombuffer(raw, dtype=np.uint8)
                acc = a.copy() if acc is None else (acc | a)
        if acc is not None:
            yield pd.DataFrame({"bits": [acc.tobytes()]})

    # Stage 1 emits one fixed-size partial per non-empty partition;
    # stage 2 shuffles those partials to ONE task and OR-folds them
    # executor-side, so exactly one m/8-byte array crosses to the
    # driver (over Arrow, not the row-based py4j path). Driver traffic
    # is O(m), independent of partition count. On a cluster with
    # thousands of partitions, add an intermediate repartition(B)
    # _reduce level so no single task fans in more than ~B partials.
    partials = df.select(hash_col).mapInPandas(_partial, "bits binary")
    merged = (
        partials.repartition(1).mapInPandas(_reduce, "bits binary").toPandas()
    )
    out = BloomFilter(bits=np.zeros(m_bytes, dtype=np.uint8), n_hashes=k)
    for raw in merged["bits"]:
        out.bits |= np.frombuffer(raw, dtype=np.uint8)
    return out


def build_banked_bloom(
    df: DataFrame,
    hash_col: str,
    capacity: int,
    fpp: float = 0.01,
    n_banks: int = 4,
) -> BankedBloomFilter:
    """Distributed banked build. Per-partition partials emit one
    (bank, bits) row per bank they saw — each m/B bits, so the
    transient bool array per task is also m/B per bank; the per-bank
    OR-fold runs as B independent groupBy tasks (vs build_bloom's
    single merge task), and the driver receives exactly B rows of m/B
    bytes = O(m) total. At cluster scale the frontier is hash-
    partitioned on url_hash, so most partitions route to ONE bank and
    the partial traffic collapses to ~m/B per partition."""
    proto = BankedBloomFilter.sized(capacity, fpp, n_banks)
    m_bytes = len(proto.banks[0].bits)
    k = proto.banks[0].n_hashes
    nb = n_banks

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tmpl = BankedBloomFilter(
            [BloomFilter(np.zeros(m_bytes, dtype=np.uint8), k) for _ in range(nb)]
        )
        bank_bits: dict[int, np.ndarray] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[hash_col].to_numpy()
            idx = tmpl._bank_idx(keys)
            for b in np.unique(idx):
                bb = bank_bits.setdefault(
                    int(b), np.zeros(m_bytes * 8, dtype=bool)
                )
                pos = tmpl.banks[int(b)]._positions(keys[idx == b])
                bb[pos.ravel().astype(np.int64)] = True
        for b, bb in bank_bits.items():
            yield pd.DataFrame(
                {"bank": [b],
                 "bits": [np.packbits(bb, bitorder="little").tobytes()]}
            )

    def _reduce(key, pdf):
        acc: np.ndarray | None = None
        for raw in pdf["bits"]:
            a = np.frombuffer(raw, dtype=np.uint8)
            acc = a.copy() if acc is None else (acc | a)
        return pd.DataFrame({"bank": [key[0]], "bits": [acc.tobytes()]})

    partials = df.select(hash_col).mapInPandas(_partial, "bank int, bits binary")
    merged = (
        partials.groupBy("bank")
        .applyInPandas(_reduce, "bank int, bits binary")
        .toPandas()
    )
    out = BankedBloomFilter(
        [BloomFilter(np.zeros(m_bytes, dtype=np.uint8), k) for _ in range(nb)]
    )
    for _, row in merged.iterrows():
        out.banks[int(row["bank"])].bits |= np.frombuffer(
            row["bits"], dtype=np.uint8
        )
    return out


#: Executor-side deserialization cache (see dedup._BLOOM_CACHE — same
#: rationale: from_bytes copies the full bit array; cache per task
#: process keyed by broadcast id).
_PREFILTER_CACHE: dict[int, "AnyBloom"] = {}
_CACHE_TOKEN = 0


def bloom_prefilter(df: DataFrame, bloom: AnyBloom, hash_col: str = "url_hash", keep_maybe_seen: bool = False) -> DataFrame:
    """Executor-side prefilter: drop rows the Bloom says are seen
    (definitely-new rows pass; 'maybe seen' rows go to the exact
    anti-join when ``keep_maybe_seen`` — see frontier.dedup)."""
    spark = df.sparkSession
    b = spark.sparkContext.broadcast(bloom.to_bytes())
    global _CACHE_TOKEN
    _CACHE_TOKEN += 1
    token = _CACHE_TOKEN  # closure-captured cache key (Broadcast has no
    # stable python-side id attribute across pyspark versions)
    cols = df.columns
    schema = df.schema

    def _filt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = _PREFILTER_CACHE.get(token)
        if bf is None:
            if len(_PREFILTER_CACHE) > 8:
                _PREFILTER_CACHE.clear()
            bf = bloom_from_bytes(b.value)
            _PREFILTER_CACHE[token] = bf
        for pdf in batches:
            if not len(pdf):
                continue
            maybe = bf.might_contain(pdf[hash_col].to_numpy())
            yield pdf[maybe] if keep_maybe_seen else pdf[~maybe]

    return df.mapInPandas(_filt, schema).select(cols)
