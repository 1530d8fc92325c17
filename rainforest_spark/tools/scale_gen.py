"""Deterministic ×N scale-up of a testdata tier (bench evidence only).

``/root/testdata`` is read-only and tops out at sf0.1, so the
100×-design claims had no measured datapoint.  This builds an sf1 tier
locally (gitignored) by unioning ``factor`` re-keyed copies of the
sf0.1 tables — everything Spark-side (no driver loops, no RNG at
generation time beyond seeded sign masks computed driver-side as
literals), so regeneration is bit-identical.

Why not 10 literal copies?  Naive duplication changes WORKLOAD SHAPE,
not just size: every document/vector would gain 9 exact twins, so
near-duplicate candidate counts would scale ×N² (every copy pairs with
every other) — benchmarking that measures the duplication artifact, not
the engine.  Instead each copy is transformed so within-copy structure
is exactly preserved while cross-copy similarity collapses:

- fact keys are offset by ``copy * KEY_OFFSET`` so cross-table joins
  stay consistent; ``region``/``nation`` stay the fixed 5/25-row dims
  (TPC-H keeps them constant at every sf) and nationkeys are untouched;
- ``documents.text`` goes through a per-copy substitution cipher
  (``translate`` — a bijection on letters/digits), so shingle sets,
  minhash signatures, token/char counts are preserved within a copy but
  disjoint across copies: text-dedup candidates scale linearly, the way
  a real 10×-bigger corpus behaves;
- ``embeddings.embedding`` gets a per-copy deterministic ±1 sign mask
  S: cos(S·a, S·b) = cos(a, b) exactly (S is diagonal, S² = I), so
  within-copy cosine structure is bit-preserved while cross-copy
  cosines collapse toward 0 — embedding near-dup pairs scale linearly
  and LSH bucket occupancy scales ×N, which is precisely the density
  effect the sf1 bench is meant to expose.
"""

from __future__ import annotations

import hashlib
import os
import string

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Bump the prefix when the generation logic changes — stale tiers
#: regenerate.  The marker embeds the factor (one .benchdata dir holds
#: sf1/factor=10 and sf10/factor=100 side by side) AND a stat-based
#: fingerprint of the SOURCE tier: the driver silently regenerates
#: /root/testdata between rounds, and without the fingerprint a scaled
#: tier built from the old data would survive the regen — the physics
#: guard would then compare sf1 times against same-run sf0.1 times on a
#: different data vintage.
_GEN_PREFIX = "sf-scale-v1"


def _src_sig(src_dir: str) -> str:
    """Cheap content fingerprint: md5 over sorted (name, size) of the
    source parquet files.  Stat-only (no reads); a testdata regeneration
    that changes any table's bytes is overwhelmingly likely to change a
    size.  mtimes are deliberately excluded — they churn on every regen
    even when content is identical."""
    h = hashlib.md5()
    for t in TABLES:
        p = os.path.join(src_dir, f"{t}.parquet")
        h.update(f"{t}:{os.path.getsize(p) if os.path.exists(p) else -1};"
                 .encode())
    return h.hexdigest()[:12]


def gen_version(factor: int, src_dir: str | None = None) -> str:
    sig = f" sig={_src_sig(src_dir)}" if src_dir else ""
    return f"{_GEN_PREFIX} factor={factor} src=sf0.1{sig}"

KEY_OFFSET = 10_000_000

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

#: Fixed dims: one copy, verbatim (joins from scaled facts keep working
#: because nationkeys are never offset).
_DIMS = {"region", "nation"}

#: key column -> offset applies, per table (copy i adds i*KEY_OFFSET).
_KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_LOWER = string.ascii_lowercase
_UPPER = string.ascii_uppercase
_DIGIT = string.digits


def _cipher(copy: int) -> tuple[str, str]:
    """Per-copy substitution alphabet (identity for copy 0).

    Copies 1..9 use letter rotation 3·copy mod 26 + digit rotation copy
    mod 10 — nonzero and pairwise distinct in that range (this keeps the
    sf1/factor=10 tier bit-identical to its round-5 generation).  The
    rotation family BREAKS beyond copy 9: at copy 26 the letter part is
    the identity and digits repeat every 10 copies, so two far-apart
    copies would share near-identical text and the dedup workloads would
    re-acquire the quadratic duplication artifact the cipher exists to
    kill.  Copies >= 10 therefore draw a full md5-seeded Fisher-Yates
    permutation of the 62-char alphabet — deterministic per copy,
    letter-changing, and pairwise distinct w.h.p. for any factor."""
    if copy < 10:
        rl, rd = (3 * copy) % 26, copy % 10
        return (_LOWER + _UPPER + _DIGIT,
                _LOWER[rl:] + _LOWER[:rl] + _UPPER[rl:] + _UPPER[:rl]
                + _DIGIT[rd:] + _DIGIT[:rd])
    # seeded Fisher-Yates over lower/upper/digits SEPARATELY (case and
    # char-class structure — token boundaries, number shapes — must be
    # preserved within a copy, exactly like the rotation family)
    def perm(chars: str, lane: str) -> str:
        out = list(chars)
        for i in range(len(out) - 1, 0, -1):
            h = hashlib.md5(f"sfcipher:{copy}:{lane}:{i}".encode()).digest()
            j = int.from_bytes(h[:4], "big") % (i + 1)
            out[i], out[j] = out[j], out[i]
        return "".join(out)

    return (_LOWER + _UPPER + _DIGIT,
            perm(_LOWER, "l") + perm(_UPPER, "u") + perm(_DIGIT, "d"))


def _sign_mask(copy: int, dim: int) -> list[float]:
    """Deterministic ±1 mask (all +1 for copy 0): md5 bit per (copy, j)."""
    if copy == 0:
        return [1.0] * dim
    out = []
    for j in range(dim):
        h = hashlib.md5(f"sfscale:{copy}:{j}".encode()).digest()
        out.append(1.0 if h[0] % 2 == 0 else -1.0)
    return out


def _one_copy(df: DataFrame, table: str, copy: int, emb_dim: int) -> DataFrame:
    out = df
    for k in _KEY_COLS.get(table, []):
        out = out.withColumn(k, F.col(k) + F.lit(copy * KEY_OFFSET))
    if table == "documents" and copy > 0:
        src, dst = _cipher(copy)
        out = out.withColumn("text", F.translate(F.col("text"), src, dst))
    if table == "embeddings" and copy > 0:
        mask = F.array(*[F.lit(s) for s in _sign_mask(copy, emb_dim)])
        out = out.withColumn(
            "embedding",
            F.zip_with(F.col("embedding"), mask, lambda x, s: x * s)
            .cast("array<float>"))
    return out


def generate_tier(spark: SparkSession, src_dir: str, dst_dir: str,
                  factor: int = 10) -> None:
    emb_dim = _embedding_dim(src_dir)
    os.makedirs(dst_dir, exist_ok=True)
    for t in TABLES:
        # events is read RAW, NOT through workload T(): T normalizes ts
        # and writing that back would change the column type the readers
        # expect.  Raw round-trips bit-identically whichever encoding
        # the source tier uses (legacy nanos-as-long or µs NTZ); T()
        # normalizes either on re-read.
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        src = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        if t in _DIMS:
            scaled = src.coalesce(1)
        else:
            copies = [_one_copy(src, t, i, emb_dim) for i in range(factor)]
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
        scaled.write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{t}.parquet"))
    with open(os.path.join(dst_dir, "GEN_VERSION"), "w") as f:
        f.write(gen_version(factor, src_dir))


def _embedding_dim(src_dir: str) -> int:
    import pyarrow.parquet as pq

    tbl = pq.ParquetFile(
        os.path.join(src_dir, "embeddings.parquet"))
    first = next(tbl.iter_batches(batch_size=1, columns=["embedding"]))
    return len(first.column(0)[0])


def ensure_tier(spark: SparkSession, src_dir: str, dst_dir: str,
                factor: int = 10) -> bool:
    """Generate the scaled tier iff absent or stale.  Returns True if a
    (re)generation ran."""
    marker = os.path.join(dst_dir, "GEN_VERSION")
    if (os.path.exists(marker)
            and open(marker).read() == gen_version(factor, src_dir)):
        return False
    generate_tier(spark, src_dir, dst_dir, factor)
    return True
