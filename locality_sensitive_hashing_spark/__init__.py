"""PySpark-native near-duplicate detection & clustering engine.

From-scratch reimplementation of the *capabilities* of
``singhj/locality-sensitive-hashing`` (MinHash-over-shingles + banded LSH
bucketing, with SimHash and suffix-array substring matching as companion
detectors; MMDS ch.3 semantics), re-expressed Spark-first over tables of
audio clip + transcript pairs.

Reference provenance: the read-only mount at /root/reference/ was empty this
session (SURVEY.md section 0.1), so semantics are pinned to BASELINE.json's
north_star plus the published algorithms (Broder 1997; Charikar STOC 2002;
MMDS sections 3.2-3.4; Manber-Myers 1990 suffix arrays). Expected reference
loci are tracked as `REF?` tags in SURVEY.md section 2 for re-anchoring.
"""

from locality_sensitive_hashing_spark.config import Config, DEFAULT_CONFIG

__all__ = ["Config", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
