"""Decoded-PCM pair verification (O18): allclose + SNR, Arrow-batched.

The audio axis of the graft (BASELINE.json input_hint): a candidate pair is
an audio duplicate iff the decoded PCM streams are np.allclose after
alignment AND SNR = 10*log10(sum(s^2)/sum((s-s')^2)) >= cfg.snr_db.
Decoding is the shared numpy WAV kernel (audio.py) -- no soundfile in the
sandbox, and on a real cluster the same UDF shape swaps in a codec library.

Scale notes: this is the ONLY stage where the `bytes` column crosses into
Python, and it runs on candidate PAIRS (post-LSH, post-cap: O(N * avg
bucket fanout), not O(N^2)). Arrow batch size is capped session-wide
(session.py) so a batch of pairs at ~2x clip payload stays well under
worker memory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark import audio as A
from locality_sensitive_hashing_spark.config import Config


def pcm_compare_udf():
    """pandas UDF: (bytes1, bytes2) -> struct(allclose boolean, snr_db double)."""

    @F.pandas_udf("allclose boolean, snr_db double")
    def compute(b1: pd.Series, b2: pd.Series) -> pd.DataFrame:
        out_close, out_snr = [], []
        for x, y in zip(b1, b2):
            close, snr = A.pcm_compare(bytes(x or b""), bytes(y or b""))
            out_close.append(close)
            out_snr.append(snr)
        return pd.DataFrame({"allclose": out_close, "snr_db": out_snr})

    return compute


def with_audio_verdict(
    pairs: DataFrame, clips: DataFrame, cfg: Config
) -> DataFrame:
    """Attach (allclose, snr_db, audio_ok) to candidate pairs.

    Two equi-joins pull each side's `bytes` onto the pair rows (sort-merge
    on clip_id; at cluster scale `clips` is bucketed by clip_id so these
    co-partition -- SURVEY.md section 4.3), then one Arrow UDF call.
    """
    b1 = clips.select(F.col("clip_id").alias("id1"), F.col("bytes").alias("bytes1"))
    b2 = clips.select(F.col("clip_id").alias("id2"), F.col("bytes").alias("bytes2"))
    udf = pcm_compare_udf()
    return (
        pairs.join(b1, "id1")
        .join(b2, "id2")
        .withColumn("_a", udf(F.col("bytes1"), F.col("bytes2")))
        .drop("bytes1", "bytes2")
        .select(
            "*",
            F.col("_a.allclose").alias("allclose"),
            F.col("_a.snr_db").alias("snr_db"),
        )
        .drop("_a")
        .withColumn(
            "audio_ok",
            F.col("allclose") & (F.col("snr_db") >= F.lit(cfg.snr_db)),
        )
    )
