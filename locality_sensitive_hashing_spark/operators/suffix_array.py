"""Suffix-array substring detector (O15): winnowing anchors + exact verify.

Two-level design (the only way this operator scales -- a global suffix
array over 10^12 transcripts is neither buildable nor needed):

1. **Anchor blocking** (linear, pure DataFrame): winnowing fingerprints
   (Schleimer et al. 2003) of each normalized transcript via an Arrow UDF,
   exploded to (clip_id, anchor) rows, then the generic blocked self-join.
   With gram_len = sa_min_len/2 and window = sa_min_len - gram_len + 1 the
   guarantee is lossless: any pair sharing a substring >= sa_min_len shares
   an anchor.
2. **Exact verification** (per candidate pair): suffix array via prefix
   doubling (Manber-Myers 1990) + Kasai LCP over t1#t2, inside a grouped
   Arrow UDF -- confirms longest-common-substring >= sa_min_len exactly.

Reference: BASELINE.json "suffix-array substring matching" companion
detector; expected locus REF? suffix-array module (UNVERIFIED -- empty
mount).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark import hashing as H
from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.operators.candidates import pairs_from_blocks


def anchors_udf(cfg: Config):
    """pandas UDF: normalized text -> array<long> winnowing anchors."""
    gram_len, window = H.sa_params(cfg)

    @F.pandas_udf("array<long>")
    def compute(norm: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(
            [
                H.winnow_anchors(t or "", gram_len, window)
                .view(np.int64)
                .tolist()
                for t in norm
            ]
        )

    return compute


def with_anchors(
    df: DataFrame, cfg: Config, norm_col: str = "norm", id_col: str = "clip_id"
) -> DataFrame:
    """(id, anchor) exploded winnowing fingerprints."""
    udf = anchors_udf(cfg)
    return df.select(
        id_col, F.explode(udf(F.col(norm_col))).alias("anchor")
    )


def lcs_udf():
    """pandas UDF: (norm1, norm2) -> exact LCS length via SA + LCP."""

    @F.pandas_udf("long")
    def compute(t1: pd.Series, t2: pd.Series) -> pd.Series:
        return pd.Series(
            [
                H.longest_common_substring_len(a or "", b or "")
                for a, b in zip(t1, t2)
            ]
        )

    return compute


def sa_candidates(
    signatures: DataFrame,
    cfg: Config,
    norm_col: str = "norm",
    id_col: str = "clip_id",
) -> DataFrame:
    """Verified substring-candidate pairs (LCS >= sa_min_len).

    ``signatures`` must carry (id, norm) -- the signature stage output
    is reused so normalization happens once. The LCS verify joins the two
    normalized texts back onto the (small) candidate set, never the corpus.
    """
    anchors = with_anchors(
        signatures.select(id_col, norm_col), cfg, norm_col, id_col
    )
    pairs = pairs_from_blocks(anchors, ["anchor"], cfg.bucket_cap, "sa", id_col=id_col)
    t1 = signatures.select(F.col(id_col).alias("id1"), F.col(norm_col).alias("t1"))
    t2 = signatures.select(F.col(id_col).alias("id2"), F.col(norm_col).alias("t2"))
    lcs = lcs_udf()
    return (
        pairs.join(t1, "id1")
        .join(t2, "id2")
        .withColumn("lcs", lcs(F.col("t1"), F.col("t2")))
        .where(F.col("lcs") >= cfg.sa_min_len)
        .select("id1", "id2", "detector", "lcs")
    )
