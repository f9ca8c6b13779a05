"""SimHash companion detector (O12-O14): fingerprint, blocking, Hamming.

Charikar STOC 2002 fingerprints with Manku et al. WWW'07 pigeonhole
blocking: split the 64-bit fingerprint into (hamming_t + 1) chunks; any
pair within Hamming distance t shares at least one exact chunk, so an
equi-join on (chunk_id, chunk_value) is a lossless candidate generator.
The Hamming verify is JVM-side ``bit_count(xor)`` -- no UDF.

Reference: BASELINE.json "SimHash ... as companion detector"; expected
locus REF? simhash module (UNVERIFIED -- empty mount).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark import hashing as H
from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.operators.candidates import pairs_from_blocks


def simhash_udf():
    """pandas UDF: raw text -> int64 SimHash fingerprint (normalizes
    internally with the shared kernel, so parity with the oracle holds)."""

    @F.pandas_udf("long")
    def compute(text: pd.Series) -> pd.Series:
        # batch-vectorized kernel: factorize tokens across the batch, hash
        # each distinct token once, 64 bincount reductions -- identical
        # values to the per-text scalar (hashing.simhash64_batch docstring)
        return pd.Series(H.simhash64_batch(text.tolist()))

    return compute


def with_fingerprint(
    df: DataFrame, text_col: str = "transcript", id_col: str = "clip_id"
) -> DataFrame:
    """(id, fingerprint) -- prunes every other column pre-UDF."""
    udf = simhash_udf()
    return df.select(id_col, udf(F.col(text_col)).alias("fingerprint"))


def explode_chunks(
    fingerprints: DataFrame, cfg: Config, id_col: str = "clip_id"
) -> DataFrame:
    """(clip_id, chunk_id, chunk_val): (t+1)-way pigeonhole split, JVM-side.

    chunk i = bits [width*i, width*(i+1)) of the unsigned fingerprint,
    via shiftrightunsigned + mask (exact match of hashing.simhash_chunks).
    """
    n_chunks = cfg.hamming_t + 1
    width = 64 // n_chunks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("fingerprint"), width * i).bitwiseAND(
                F.lit(mask)
            )
            for i in range(n_chunks)
        ]
    )
    return fingerprints.select(
        id_col, F.posexplode(chunks).alias("chunk_id", "chunk_val")
    )


def simhash_candidates(
    fingerprints: DataFrame, cfg: Config, id_col: str = "clip_id",
    dedup: bool = True,
) -> DataFrame:
    """Pairs with Hamming(f1, f2) <= t: chunk-join then bit_count verify.

    ``dedup=False`` lets a downstream union dedup instead (the Hamming
    verify then runs on up-to-(t+1)x duplicated pairs, which is cheaper
    than a dedicated distinct shuffle -- it's one JVM bit_count per row).
    """
    pairs = pairs_from_blocks(
        explode_chunks(fingerprints, cfg, id_col),
        ["chunk_id", "chunk_val"],
        cfg.bucket_cap,
        "simhash",
        id_col=id_col,
        dedup=dedup,
    )
    fp1 = fingerprints.select(
        F.col(id_col).alias("id1"), F.col("fingerprint").alias("f1")
    )
    fp2 = fingerprints.select(
        F.col(id_col).alias("id2"), F.col("fingerprint").alias("f2")
    )
    return (
        pairs.join(fp1, "id1")
        .join(fp2, "id2")
        .where(hamming_distance(F.col("f1"), F.col("f2")) <= cfg.hamming_t)
        .select("id1", "id2", "detector")
    )


def hamming_distance(f1, f2) -> "F.Column":
    """popcount(f1 XOR f2) -- JVM bit_count (O14)."""
    return F.bit_count(f1.bitwiseXOR(f2))
