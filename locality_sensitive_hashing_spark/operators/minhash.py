"""MinHash signature + band-hash operator (O2-O7).

The signature stage of the reference's "signature matrix" build
(REF?lsh_matrix.py, UNVERIFIED -- empty mount; semantics MMDS section
3.3.5 / Broder 1997), re-expressed as ONE Arrow-vectorized pandas UDF per
row-batch: normalize (JVM-side Column expr) -> k-shingle set -> universal
hash MinHash -> per-band bucket keys.  No per-row Python: the UDF body is
one numpy broadcast per document over its shingle set
(BASELINE.json: "numpy-batched universal-hash MinHash ... no per-row
Python").

Scale notes (10^12 clips): this stage is embarrassingly parallel and
linear in input size; `bytes` never enters it (column pruning keeps the
scan at clip_id+transcript -- verified via explain() in tests); output is
~H*8 bytes/row (1 KB at H=128), i.e. ~1 PB of signatures at 10^12 rows,
written partitioned by clip_id hash for the later verification join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locality_sensitive_hashing_spark import hashing as H
from locality_sensitive_hashing_spark.config import Config
from locality_sensitive_hashing_spark.functions.text import normalize_text


def signature_udf(cfg: Config):
    """pandas UDF: normalized text -> struct(sig, band_hashes).

    The (a_j, b_j) family is derived on the driver from cfg.seed and
    captured in the closure (2*H int64 -- tiny), so every executor uses the
    identical family as the numpy oracle (fixture parity requirement,
    BASELINE.json "identical shingle-size/num-hashes/band-row config").
    """
    a, b = H.hash_family(cfg)
    k, p, stype = cfg.shingle_k, cfg.modulo_prime, cfg.shingle_type
    bands, rows = cfg.bands, cfg.rows_per_band

    # sig components are < modulo_prime, so with the default Mersenne-31
    # prime they store EXACTLY in int32: array<int> halves the widest
    # payload the pipeline shuffles (both signature arrays ride every
    # pair-metric join). A wider prime falls back to int64.
    narrow = p <= (1 << 31) - 1
    sig_type = "array<int>" if narrow else "array<long>"

    @F.pandas_udf(f"sig {sig_type}, band_hashes array<long>")
    def compute(norm: pd.Series) -> pd.DataFrame:
        import numpy as np

        sigs, bhs = [], []
        for text in norm:
            ss = H.shingle_set(text or "", k, stype)
            sig = H.minhash_signature(ss, a, b, p)
            sigs.append((sig.astype(np.int32) if narrow else sig).tolist())
            bhs.append(H.band_hashes(sig, bands, rows).tolist())
        return pd.DataFrame({"sig": sigs, "band_hashes": bhs})

    return compute


def shingles_udf(cfg: Config):
    """pandas UDF: normalized text -> sorted distinct int64 shingle hashes.

    Only used by parity tests and the shingle-level queries; the pipeline
    computes shingles inside :func:`signature_udf` without materializing
    them.
    """
    k, stype = cfg.shingle_k, cfg.shingle_type

    @F.pandas_udf("array<long>")
    def compute(norm: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(
            [H.shingle_set(t or "", k, stype).view(np.int64).tolist() for t in norm]
        )

    return compute


def with_signatures(
    df: DataFrame,
    cfg: Config,
    text_col: str = "transcript",
    id_col: str = "clip_id",
    pre_normalized: bool = False,
) -> DataFrame:
    """Project (id, norm, sig, band_hashes) from a corpus DataFrame.

    Selects ONLY id + text before the UDF so Catalyst prunes `bytes`
    out of the parquet scan (the audio payload must never ride through the
    signature shuffle -- SURVEY.md section 4.2).  In the production
    pipeline ``df`` is the distinct-texts table (one row per unique
    transcript, ``pre_normalized=True``) -- the signature cost scales with
    unique content, not corpus size.
    """
    udf = signature_udf(cfg)
    norm = F.col(text_col) if pre_normalized else normalize_text(text_col)
    return (
        df.select(id_col, norm.alias("norm"))
        .withColumn("_sb", udf(F.col("norm")))
        .select(id_col, "norm", F.col("_sb.sig").alias("sig"),
                F.col("_sb.band_hashes").alias("band_hashes"))
    )


def explode_bands(signatures: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """(id, band_id, band_hash) rows -- MMDS section 3.4.1 banding
    explode; the groupBy key of the LSH bucket stage (O8)."""
    return signatures.select(
        id_col, F.posexplode("band_hashes").alias("band_id", "band_hash")
    )


def estimated_jaccard(sig1, sig2) -> "F.Column":
    """Fraction of equal signature components (MMDS section 3.3.3) --
    JVM-side zip_with/aggregate, no UDF.

    NOTE: Spark does not codegen higher-order-function lambdas, so each of
    the H comparisons is expression-interpreted per pair.  Fine for ad-hoc
    use and tests; the pair-verification hot path uses
    :func:`estimated_jaccard_udf` instead (one Arrow-batched numpy compare
    per batch, bit-exact same result: equal-count / H in float64).
    """
    eq = F.zip_with(sig1, sig2, lambda x, y: (x == y).cast("int"))
    return (
        F.aggregate(eq, F.lit(0), lambda acc, x: acc + x) / F.size(sig1)
    ).cast("double")


def estimated_jaccard_udf():
    """Arrow-vectorized est-Jaccard: pandas UDF (sig1, sig2) -> double.

    All signatures share the config-fixed length H (they come from
    :func:`signature_udf`), so a batch stacks into two (B, H) integer
    matrices and the whole batch is ONE ``(S1 == S2).mean(axis=1)``
    broadcast -- no per-element expression interpretation.  Bit-exact vs
    :func:`estimated_jaccard`: both compute (# equal components) / H as an
    exact small-int ratio in IEEE float64 (pinned by
    tests/test_operators.py parity).
    """

    @F.pandas_udf("double")
    def compute(sig1: pd.Series, sig2: pd.Series) -> pd.Series:
        import numpy as np

        n = len(sig1)
        if n == 0:
            return pd.Series([], dtype="float64")
        a1, a2 = sig1.to_numpy(), sig2.to_numpy()
        lens = np.fromiter((v.size for v in a1), dtype=np.int64, count=n)
        out = np.empty(n, dtype=np.float64)
        # production batches have ONE length (config-fixed H) -> one vstack;
        # the loop only matters for ad-hoc mixed-length inputs
        for h in np.unique(lens):
            idx = np.nonzero(lens == h)[0]
            s1 = np.vstack([a1[i] for i in idx])
            s2 = np.vstack([a2[i] for i in idx])
            out[idx] = (s1 == s2).mean(axis=1)
        return pd.Series(out)

    return compute
