"""Deterministic clips-corpus synthesis with planted duplicate classes.

Schema mandated by BASELINE.json input_hint:
``clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string``.  Planted classes and fractions follow FIXTURES.md
section 1; all generation is seeded (numpy default_rng) and self-contained
(driver rule: no external data).  The labels returned alongside the corpus
are *construction* labels used for sanity assertions; the quantitative
ground truth for recall is the numpy oracle run at the pinned Config.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from locality_sensitive_hashing_spark import audio as A
from locality_sensitive_hashing_spark import hashing as H
from locality_sensitive_hashing_spark.config import DEFAULT_CONFIG as _CFG

# 60-word vocabulary, same flavor as the driver's documents.text
# (verified sample in SURVEY.md Appendix A)
VOCAB = [
    "the", "a", "fast", "slow", "big", "small", "key", "order", "sort",
    "table", "scan", "merge", "part", "window", "hash", "join", "batch",
    "stream", "spark", "dup", "group", "query", "row", "data", "filter",
    "customer", "line", "value", "agg", "column", "vector", "shuffle",
    "bucket", "cluster", "shingle", "signature", "band", "audio", "clip",
    "codec", "sample", "rate", "token", "text", "index", "cache", "disk",
    "memory", "stage", "task", "plan", "node", "edge", "graph", "label",
    "prime", "modulo", "seed", "pair", "match",
]

CODECS = ("pcm_s16le", "pcm_f32le")


def _transcript(rng: np.random.Generator, lo: int = 20, hi: int = 80) -> list[str]:
    n = int(rng.integers(lo, hi + 1))
    return [VOCAB[i] for i in rng.integers(0, len(VOCAB), n)]


def _substitute(rng: np.random.Generator, toks: list[str], n_subs: int) -> list[str]:
    out = list(toks)
    idx = rng.choice(len(out), size=min(n_subs, len(out)), replace=False)
    for i in idx:
        out[i] = VOCAB[int(rng.integers(0, len(VOCAB)))]
    return out


def _true_jaccard(t1: list[str], t2: list[str], k: int = _CFG.shingle_k) -> float:
    s1 = H.shingle_set(H.normalize_text(" ".join(t1)), k)
    s2 = H.shingle_set(H.normalize_text(" ".join(t2)), k)
    return len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))


def _near_variant(
    rng: np.random.Generator, toks: list[str], min_j: float, lo: int, hi: int
) -> list[str]:
    """Token-substituted variant whose true shingle-Jaccard stays >= min_j.

    Keeps the planted pair inside the banding detector's near-certain zone
    (hit prob 1-(1-J^r)^b >= 0.999 at J >= 0.7 with b=32, r=4 -- MMDS
    section 3.4.2); the fixture seed is pinned, so a passing corpus stays
    passing.
    """
    for n_subs in range(hi, lo - 1, -1):
        for _ in range(8):
            cand = _substitute(rng, toks, n_subs)
            if _true_jaccard(toks, cand) >= min_j and cand != toks:
                return cand
    return _substitute(rng, toks, lo)


def _simhash_near_variant(
    rng: np.random.Generator, toks: list[str], max_ham: int
) -> list[str]:
    """Variant with Hamming(simhash) <= max_ham by construction check
    (FIXTURES.md simhash-near class)."""
    base_fp = H.simhash64(" ".join(toks))
    for n_subs in (1, 1, 1, 2, 2, 1, 1, 1):
        cand = _substitute(rng, toks, n_subs)
        if cand != toks and H.hamming64(base_fp, H.simhash64(" ".join(cand))) <= max_ham:
            return cand
    return toks[:-1] + [toks[-1]]  # last resort: duplicate-ish (ham small)


def make_clips(
    n_rows: int, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build a clips corpus of ~n_rows with planted duplicate classes.

    Returns (clips, planted) where planted has columns
    (id1, id2, dup_class, expect_dup) -- expect_dup False for the negative
    controls that must never cluster together (FIXTURES.md section 1).
    """
    rng = np.random.default_rng(seed)
    rows: list[dict] = []
    planted: list[tuple[str, str, str, bool]] = []
    next_id = [0]

    def new_row(transcript: list[str], pcm: np.ndarray | None = None,
                sr: int | None = None, codec: str | None = None,
                raw: bytes | None = None, dur_ms: int | None = None) -> dict:
        cid = f"clip{next_id[0]:08d}"
        next_id[0] += 1
        if raw is None:
            sr = sr or int(rng.choice([8000, 16000]))
            dur_ms = dur_ms or int(rng.integers(250, 2001))
            codec = codec or str(rng.choice(CODECS))
            pcm = pcm if pcm is not None else A.synth_pcm(rng, sr, dur_ms)
            raw = A.encode_wav(pcm, sr, codec)
        row = {
            "clip_id": cid, "bytes": raw, "sr_hz": sr, "dur_ms": dur_ms,
            "codec": codec, "transcript": " ".join(transcript), "_pcm": pcm,
        }
        rows.append(row)
        return row

    # fractions of n_rows that are *partner* rows per class (FIXTURES.md)
    plan = [
        ("exact", 0.05), ("reencoded", 0.05), ("near_transcript", 0.08),
        ("substring", 0.04), ("simhash_near", 0.03), ("neg_audio", 0.015),
        ("neg_text", 0.015), ("chain", 0.02), ("gain", 0.02),
    ]
    counts = {name: max(1, int(n_rows * frac)) for name, frac in plan}
    n_planted_rows = sum(
        c * (2 if name != "chain" else 3) for name, c in counts.items()
    ) - counts["chain"] * 0  # chain groups contribute 3 rows each
    n_singletons = max(0, n_rows - n_planted_rows)

    for _ in range(n_singletons):
        new_row(_transcript(rng))

    for name, c in counts.items():
        for _ in range(c):
            toks = _transcript(rng)
            if name == "exact":
                s = new_row(toks)
                p = new_row(toks, raw=s["bytes"], sr=s["sr_hz"],
                            codec=s["codec"], dur_ms=s["dur_ms"], pcm=s["_pcm"])
                planted.append((s["clip_id"], p["clip_id"], name, True))
            elif name == "reencoded":
                sr = int(rng.choice([8000, 16000]))
                dur = int(rng.integers(250, 2001))
                pcm = A.synth_pcm(rng, sr, dur)
                s = new_row(toks, pcm=pcm, sr=sr, codec="pcm_f32le", dur_ms=dur)
                p = new_row(toks, pcm=pcm, sr=sr, codec="pcm_s16le", dur_ms=dur)
                planted.append((s["clip_id"], p["clip_id"], name, True))
            elif name in ("near_transcript", "simhash_near"):
                variant = (
                    _near_variant(rng, toks, 0.7, 2, 6)
                    if name == "near_transcript"
                    else _simhash_near_variant(rng, toks, 3)
                )
                s = new_row(toks)
                p = new_row(variant, raw=s["bytes"],
                            sr=s["sr_hz"], codec=s["codec"],
                            dur_ms=s["dur_ms"], pcm=s["_pcm"])
                planted.append((s["clip_id"], p["clip_id"], name, True))
            elif name == "substring":
                # A's transcript embedded verbatim inside longer B
                inner = _transcript(rng, 10, 20)
                outer = _transcript(rng, 15, 25) + inner + _transcript(rng, 15, 25)
                s = new_row(inner)
                p = new_row(outer, raw=s["bytes"], sr=s["sr_hz"],
                            codec=s["codec"], dur_ms=s["dur_ms"], pcm=s["_pcm"])
                planted.append((s["clip_id"], p["clip_id"], name, True))
            elif name == "neg_audio":
                # same transcript, audio SNR in [25, 29.9) dB: must NOT dup
                sr = int(rng.choice([8000, 16000]))
                dur = int(rng.integers(250, 2001))
                pcm = A.synth_pcm(rng, sr, dur)
                noisy = A.add_noise_at_snr(rng, pcm, float(rng.uniform(25.0, 29.9)))
                s = new_row(toks, pcm=pcm, sr=sr, codec="pcm_f32le", dur_ms=dur)
                p = new_row(toks, pcm=noisy, sr=sr, codec="pcm_f32le", dur_ms=dur)
                planted.append((s["clip_id"], p["clip_id"], name, False))
            elif name == "neg_text":
                # transcript Jaccard ~0.2, different audio: must NOT dup.
                # Kept tokens are INTERLEAVED with fresh ones so no long
                # verbatim common substring sneaks past the SA detector.
                keep = max(2, len(toks) // 5)
                fresh = _transcript(rng, 30, 50)
                part: list[str] = []
                for i, tok in enumerate(fresh):
                    part.append(tok)
                    if i < keep:
                        part.append(toks[i])
                while (
                    H.longest_common_substring_len(
                        H.normalize_text(" ".join(toks)),
                        H.normalize_text(" ".join(part)),
                    )
                    >= _CFG.sa_min_len
                ):
                    part = _transcript(rng, 30, 50)
                s = new_row(toks)
                p = new_row(part)
                planted.append((s["clip_id"], p["clip_id"], name, False))
            elif name == "gain":
                # +6 dB re-master under an unrelated transcript: only the
                # gain-invariant fingerprint detector can pair it.  int16
                # ground truth at <= 0.45 peak (exact x2 headroom), >= 700
                # ms so the code sequence clears the MIN_CODES floor.
                sr = int(rng.choice([8000, 16000]))
                dur = int(rng.integers(700, 1501))
                ints = np.clip(
                    np.round(synth_env_pcm(rng, sr, dur) * 0.5 * 32767.0),
                    -32768, 32767,
                ).astype(np.int64)
                s = new_row(toks, raw=A.encode_wav(ints / 32767.0, sr,
                                                   "pcm_s16le"),
                            sr=sr, codec="pcm_s16le", dur_ms=dur,
                            pcm=ints / 32767.0)
                p = new_row(_transcript(rng),
                            raw=A.encode_wav((ints * 2) / 32767.0, sr,
                                             "pcm_s16le"),
                            sr=sr, codec="pcm_s16le", dur_ms=dur,
                            pcm=(ints * 2) / 32767.0)
                planted.append((s["clip_id"], p["clip_id"], name, True))
            elif name == "chain":
                # A~B~C transitively (same audio); A,C not directly similar
                s = new_row(toks)
                b_toks = _near_variant(rng, toks, 0.7, 2, 3)
                b = new_row(b_toks, raw=s["bytes"], sr=s["sr_hz"],
                            codec=s["codec"], dur_ms=s["dur_ms"], pcm=s["_pcm"])
                c = new_row(_near_variant(rng, b_toks, 0.7, 2, 3), raw=s["bytes"],
                            sr=s["sr_hz"], codec=s["codec"],
                            dur_ms=s["dur_ms"], pcm=s["_pcm"])
                planted.append((s["clip_id"], b["clip_id"], name, True))
                planted.append((b["clip_id"], c["clip_id"], name, True))

    clips = pd.DataFrame(rows).drop(columns=["_pcm"])
    # shuffle row order (pipeline must be order-invariant) but keep ids stable
    clips = clips.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    planted_df = pd.DataFrame(
        planted, columns=["id1", "id2", "dup_class", "expect_dup"]
    )
    return clips, planted_df


def bench_clips_df(spark, sf_dir: str, replicate: int = 20, seed: int = 42):
    """Distributed bench corpus: sf documents replicated x`replicate` with
    fresh clip ids (FIXTURES.md clips_bench), audio synthesized IN
    EXECUTORS via mapInPandas (deterministic per (doc_id, rep) substream),
    so corpus construction itself scales with the cluster.

    Web-scale-realistic duplication mix per document family:
    - rep 0: the original (text + audio)
    - rep 1: byte-identical audio + identical transcript (exact dup ->
      chain edge, real cluster)
    - reps >= 2: NEAR-VARIANT transcript (1-3 deterministic token
    substitutions) + unique audio -> every replica is distinct content
    that must flow through the full detector + digest-screen path and
    then FAIL audio verify. This makes the bench compute-bound in the
    parallel stages (signatures, banding joins, Jaccard estimates,
    screens) rather than in fixed per-stage overhead.
    """
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.sources.tables import (
        CLIPS_SCHEMA,
        read_testdata,
    )

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    reps = spark.range(replicate).select(F.col("id").cast("int").alias("rep"))
    base = docs.crossJoin(reps)

    def synth(batches):
        for pdf in batches:
            out = []
            for doc_id, text, rep in zip(pdf["doc_id"], pdf["text"], pdf["rep"]):
                rep = int(rep)
                audio_rep = 0 if rep == 1 else rep
                rng = np.random.default_rng([seed, int(doc_id), audio_rep])
                sr, dur = 8000, 250
                raw = A.encode_wav(A.synth_pcm(rng, sr, dur), sr, "pcm_s16le")
                if rep >= 2:
                    trng = np.random.default_rng([seed, int(doc_id), rep, 1])
                    toks = str(text).split()
                    text = " ".join(_substitute(trng, toks, 1 + rep % 3))
                out.append(
                    (f"doc{int(doc_id):08d}r{rep:02d}", raw, sr, dur,
                     "pcm_s16le", text)
                )
            yield pd.DataFrame(
                out,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                         "transcript"],
            )

    return base.repartition(64, "doc_id", "rep").mapInPandas(synth, CLIPS_SCHEMA)


def clips_from_documents_df(spark, sf_dir: str, seed: int = 42,
                            plant_dups: bool = False, limit: int | None = None):
    """Distributed clips synthesis from the driver's ``documents`` table.

    One clip per doc; with ``plant_dups`` every 10th doc gains an exact
    copy 'x' and a near-dup transcript variant 'n' sharing the audio, and
    every 20th doc additionally gains an audio-CONTENT family: an
    enveloped 1000 ms master 'e' (its own unrelated transcript;
    synthesized at <= 0.45 full scale and quantized ONCE to int16 -- the
    integer samples are the ground truth the variants derive from) plus
    TWO republications of the SAME recording, each under ANOTHER
    unrelated transcript:

    - 'f': head-trimmed (the first 800 samples removed) -- different
      bytes, different length, different transcript; only the
      frame-energy content detector (operators/audio_lsh.py, folded into
      the flagship DAG round 5) can pair it with 'e'.
    - 'g': the SAME int16 samples scaled by exactly 2 (+6 dB re-master;
      headroom guaranteed by the 0.45 peak) -- different bytes, different
      transcript, and every frame-energy symbol shifts quantization bins
      so the energy detector misses it BY CONSTRUCTION; only the
      gain-invariant sign-bit fingerprint detector
      (operators/audio_fingerprint.py, folded in as the fifth edge
      source) can pair it with 'e' (exactly: every band correlation
      doubles, no difference-of-differences sign flips, BER == 0).

    Connected components must then cluster {e, f, g} together through
    two different content axes.  The 250 ms flat-tone base clips sit
    below BOTH detectors' low-information floors by construction (too
    few energy shingles; 6 < MIN_CODES fingerprint codes), so they are
    excluded from content blocking exactly as a web corpus's
    short/silent clips would be.
    Audio synthesis + variant generation run IN EXECUTORS via mapInPandas
    with a per-doc seeded rng -- no driver-side pandas corpus, so the
    generator itself scales with the cluster (the round-1 driver-loop
    version bottlenecked any larger-sf use in driver pandas and was
    removed).
    """
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.sources.tables import (
        CLIPS_SCHEMA,
        read_testdata,
    )

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    if limit is not None:
        docs = docs.where(F.col("doc_id") < limit)

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                rng = np.random.default_rng([seed, doc_id])
                sr, dur = 8000, 250
                raw = A.encode_wav(A.synth_pcm(rng, sr, dur), sr, "pcm_s16le")
                base = f"doc{doc_id:08d}r00"
                text = str(text)
                rows.append((base, raw, sr, dur, "pcm_s16le", text))
                if plant_dups and doc_id % 10 == 0:
                    rows.append((base + "x", raw, sr, dur, "pcm_s16le", text))
                    toks = text.split()
                    rows.append((
                        base + "n", raw, sr, dur, "pcm_s16le",
                        " ".join(_near_variant(rng, toks, 0.7, 1, 3)),
                    ))
                if plant_dups and doc_id % 20 == 0:
                    # audio-content family: enveloped master + head-trimmed
                    # + gain-scaled republications, all under unrelated
                    # transcripts (disjoint rng substream so base clips are
                    # unchanged).  int16 ground truth quantized once;
                    # encode_wav round-trips ints/32767.0 to exactly ints.
                    erng = np.random.default_rng([seed, doc_id, 7])
                    edur = 1000
                    epcm = synth_env_pcm(erng, sr, edur) * 0.5  # peak <= .45
                    eints = np.clip(
                        np.round(epcm * 32767.0), -32768, 32767
                    ).astype(np.int64)
                    rows.append((
                        base + "e",
                        A.encode_wav(eints / 32767.0, sr, "pcm_s16le"),
                        sr, edur, "pcm_s16le",
                        f"enveloped master recording number {doc_id}",
                    ))
                    rows.append((
                        base + "f",
                        A.encode_wav(eints[800:] / 32767.0, sr, "pcm_s16le"),
                        sr, 900, "pcm_s16le",
                        f"retake {doc_id} republished with the opening trimmed",
                    ))
                    rows.append((
                        base + "g",
                        A.encode_wav((eints * 2) / 32767.0, sr, "pcm_s16le"),
                        sr, edur, "pcm_s16le",
                        f"remaster {doc_id} republished six decibels louder",
                    ))
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                         "transcript"],
            )

    return docs.repartition(32, "doc_id").mapInPandas(synth, CLIPS_SCHEMA)


_SKEW_BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "magpies argue about the provenance of a particularly shiny button "
    "found beneath the old oak near the riverbank on a gray tuesday "
    "morning in late november just before the first snow settled in"
)


def skew_clips_df(spark, n_rep: int, n_hot: int):
    """Adversarial-skew corpus: (clips_df, rep_ids, hot_ids).

    The two hot-spot shapes a web-scale corpus WILL contain:

    - ``n_rep`` byte-identical repeats of one clip (one transcript, one
      payload): must cost O(n) via the content-class star chain. The blob
      is synthesized INSIDE executors from a fixed seed -- deterministic,
      hence byte-identical across rows with no driver broadcast.
    - ``n_hot`` distinct near-identical texts (common 200+-char prefix,
      tiny distinct tail): they share ~97% of shingles so most of their
      32 band hashes collide into buckets of size ~n_hot, engineered to
      exceed ``bucket_cap`` -- the bounded-bucket drop path under test.

    Used by tests/test_skew_stress.py (small) and bench_skew.py (large).
    """
    from locality_sensitive_hashing_spark.sources.tables import CLIPS_SCHEMA as _S

    def synth_rep(batches):
        for pdf in batches:
            rng = np.random.default_rng(990001)
            raw = A.encode_wav(A.synth_pcm(rng, 8000, 250), 8000, "pcm_s16le")
            ids = [f"rep{int(i):09d}" for i in pdf["id"]]
            yield pd.DataFrame({
                "clip_id": ids, "bytes": [raw] * len(ids),
                "sr_hz": np.int32(8000), "dur_ms": np.int32(250),
                "codec": "pcm_s16le", "transcript": _SKEW_BASE_TEXT,
            })

    rep = spark.range(n_rep).repartition(32).mapInPandas(synth_rep, _S)

    def synth_hot(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng([990002, i])
                raw = A.encode_wav(
                    A.synth_pcm(rng, 8000, 250), 8000, "pcm_s16le"
                )
                rows.append((
                    f"hot{i:07d}", raw, 8000, 250, "pcm_s16le",
                    f"{_SKEW_BASE_TEXT} variant tail number {i:04d}",
                ))
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                         "transcript"],
            )

    hot = spark.range(n_hot).repartition(8).mapInPandas(synth_hot, _S)
    rep_ids = {f"rep{i:09d}" for i in range(n_rep)}
    hot_ids = {f"hot{i:07d}" for i in range(n_hot)}
    return rep.unionByName(hot), rep_ids, hot_ids


def synth_env_pcm(rng: np.random.Generator, sr_hz: int, dur_ms: int,
                  n_knots: int = 10) -> np.ndarray:
    """Enveloped test tone: synth_pcm shaped by a per-clip random
    piecewise-linear amplitude envelope (speech-like energy contour).

    The flat peak-normalized tones of :func:`synth_pcm` have near-constant
    frame energy -- useless for an energy-contour detector (every clip
    quantizes to 1-2 symbols).  The envelope gives each clip a distinctive
    ~26 dB energy trajectory, which is what real speech/audio has."""
    pcm = A.synth_pcm(rng, sr_hz, dur_ms)
    knots = rng.uniform(0.05, 1.0, n_knots)
    env = np.interp(
        np.arange(pcm.size), np.linspace(0, pcm.size - 1, n_knots), knots
    )
    return pcm * env


def audio_dup_clips_df(spark, sf_dir: str, seed: int = 42,
                       limit: int = 200, republish_every: int | None = None,
                       gain_every: int | None = None, dur_ms: int = 500):
    """Audio-CONTENT duplicate corpus for the frame-energy LSH detector.

    One enveloped 500 ms s16le clip per document (doc_id < limit), plus
    planted variants whose BYTES differ but whose audio content matches:

    - ``...t`` (every 5th doc): head-trimmed copy -- the first 800
      samples (4 energy frames) removed, re-encoded.  Byte-level classes
      miss it (different blob), PCM allclose misses it (different
      length), and its transcript is replaced wholesale so every text
      detector misses it too.  ONLY a content detector can pair these.
    - ``...z`` (every 7th doc): same PCM plus white noise at 40 dB SNR --
      a re-recorded/re-mastered near-dup.  Also given an unrelated
      transcript.
    - ``...r`` (every ``republish_every``-th doc, when set): the SAME
      bytes republished under an unrelated transcript -- the
      exact-payload star-edge class (maintenance.audio_text_edges class
      (a)); only byte identity can pair it with its source.  Off by
      default so the detector-fixture corpora (and their committed aux
      snapshots) are unchanged.
    - ``...q`` (every ``gain_every``-th doc, when set): a -6 dB QUIET
      re-master -- the int16 samples halved with round-to-nearest
      (exact 0.5x scaling up to +/-0.5 LSB), re-encoded, transcript
      replaced.  A x2 louder master would clip (the base peaks at 0.9
      full scale), so the quiet direction carries the gain axis here.
      Every frame-energy symbol shifts by 2 octaves x 2^sub_bits bins,
      so the energy-LSH detector misses it BY CONSTRUCTION (measured
      J <= 0.086 vs threshold 0.35); byte identity and every text
      detector miss it too.  ONLY the gain-invariant sign fingerprint
      (operators/audio_fingerprint.py) pairs it: +/-0.5 LSB rounding
      flips a measured max 1.1% of sign bits (BER_MAX = 0.2, cross-clip
      floor 0.30) with >= 22 exact 8-code windows surviving for the
      pigeonhole lookup.  Requires ``dur_ms`` >= 1000: at the default
      500 ms a clip has 14 sign codes, below the detector's
      MIN_CODES = 16 eligibility floor.
    - ``dur_ms``: clip length (default 500 keeps the detector-fixture
      corpora byte-stable; the maintenance corpus uses 1000 so the
      gain axis is eligible).

    Synthesis runs IN EXECUTORS via mapInPandas with per-doc seeded
    substreams (stream [seed, doc_id, 11] -- disjoint from
    clips_from_documents_df's [seed, doc_id]), so generation scales with
    the cluster and the corpus is deterministic row-by-row."""
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.sources.tables import (
        CLIPS_SCHEMA,
        read_testdata,
    )

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.where(F.col("doc_id") < limit)

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                rng = np.random.default_rng([seed, doc_id, 11])
                sr, dur = 8000, dur_ms
                pcm = synth_env_pcm(rng, sr, dur)
                raw = A.encode_wav(pcm, sr, "pcm_s16le")
                rows.append(
                    (f"a{doc_id:08d}b", raw, sr, dur, "pcm_s16le", str(text))
                )
                if republish_every and doc_id % republish_every == 0:
                    rows.append((
                        f"a{doc_id:08d}r", raw, sr, dur, "pcm_s16le",
                        f"republication {doc_id} under a new title",
                    ))
                if gain_every and doc_id % gain_every == 0:
                    # ground truth is the base clip's INT16 samples (the
                    # encode_wav round-trip is exact), halved to nearest
                    ints = np.clip(
                        np.round(pcm * 32767.0), -32768, 32767
                    ).astype(np.int64)
                    quiet = np.round(ints.astype(np.float64) * 0.5)
                    rows.append((
                        f"a{doc_id:08d}q",
                        A.encode_wav(quiet / 32767.0, sr, "pcm_s16le"),
                        sr, dur, "pcm_s16le",
                        f"quiet master {doc_id} republished 6 dB down",
                    ))
                if doc_id % 5 == 0:
                    raw_t = A.encode_wav(pcm[800:], sr, "pcm_s16le")
                    rows.append((
                        f"a{doc_id:08d}t", raw_t, sr, 400, "pcm_s16le",
                        f"retake {doc_id} republished with the opening trimmed",
                    ))
                if doc_id % 7 == 0:
                    noisy = A.add_noise_at_snr(rng, pcm, 40.0)
                    raw_z = A.encode_wav(noisy, sr, "pcm_s16le")
                    rows.append((
                        f"a{doc_id:08d}z", raw_z, sr, dur, "pcm_s16le",
                        f"remaster {doc_id} captured from a noisier source",
                    ))
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                         "transcript"],
            )

    return docs.repartition(32, "doc_id").mapInPandas(synth, CLIPS_SCHEMA)


def audio_gain_clips_df(spark, sf_dir: str, seed: int = 42,
                        limit: int = 120):
    """Audio GAIN-re-master corpus for the Haitsma-Kalker fingerprint
    detector (operators/audio_fingerprint.py).

    One enveloped 1000 ms s16le clip per document (doc_id < limit),
    synthesized at <= 0.45 full scale and quantized ONCE to int16 --
    the integer samples, not the float PCM, are the ground truth the
    variants derive from, so the planted invariances are exact:

    - ``...g`` (every 3rd doc): the SAME int16 samples scaled by exactly
      2 (headroom guaranteed by the 0.45 peak), re-encoded -- a +6 dB
      re-master.  Different bytes, different (replaced) transcript, and
      every frame-energy symbol of the energy-LSH detector shifts by 8
      quantization bins, so ONLY the gain-invariant sign fingerprint can
      pair it with its source (exactly: every band correlation doubles,
      no difference-of-differences sign flips, BER == 0).
    - ``...n`` (every 4th doc): the int16 samples plus deterministic
      integer dither uniform in [-8, 8] -- a low-level re-encode.  Flips
      a measured median 1.1% / max 12.2% of fingerprint bits, inside
      BER_MAX = 0.2 with >= one exact 8-code window surviving for the
      pigeonhole lookup (measured 40/40 on this corpus shape).

    Synthesis runs IN EXECUTORS via mapInPandas with per-doc seeded
    substreams (stream [seed, doc_id, 13] -- disjoint from the energy
    detector's [seed, doc_id, 11]), deterministic row-by-row.
    """
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.sources.tables import (
        CLIPS_SCHEMA,
        read_testdata,
    )

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.where(F.col("doc_id") < limit)

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                rng = np.random.default_rng([seed, doc_id, 13])
                sr, dur = 8000, 1000
                pcm = synth_env_pcm(rng, sr, dur) * 0.5  # peak <= 0.45
                ints = np.clip(
                    np.round(pcm * 32767.0), -32768, 32767
                ).astype(np.int64)
                # encode_wav round-trips ints/32767.0 to exactly ints
                rows.append((
                    f"f{doc_id:08d}b", A.encode_wav(ints / 32767.0, sr,
                                                    "pcm_s16le"),
                    sr, dur, "pcm_s16le", str(text),
                ))
                if doc_id % 3 == 0:
                    rows.append((
                        f"f{doc_id:08d}g",
                        A.encode_wav((ints * 2) / 32767.0, sr, "pcm_s16le"),
                        sr, dur, "pcm_s16le",
                        f"remaster {doc_id} republished 6 dB louder",
                    ))
                if doc_id % 4 == 0:
                    dith = rng.integers(-8, 9, ints.size)
                    noisy = np.clip(ints + dith, -32768, 32767)
                    rows.append((
                        f"f{doc_id:08d}n",
                        A.encode_wav(noisy / 32767.0, sr, "pcm_s16le"),
                        sr, dur, "pcm_s16le",
                        f"re-encode {doc_id} from a dithered master",
                    ))
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                         "transcript"],
            )

    return docs.repartition(32, "doc_id").mapInPandas(synth, CLIPS_SCHEMA)


def audio_rate_clips_df(spark, sf_dir: str, seed: int = 42,
                        limit: int = 120):
    """Cross-SAMPLE-RATE re-publication corpus for the rate-normalized
    energy detector (operators/audio_lsh.rate_normalized_near_dups).

    One enveloped 1000 ms 8 kHz s16le clip per document
    (``r{doc_id:08d}b``, rng substream [seed, doc_id, 17] -- disjoint
    from every other fixture stream); int16 samples are the ground
    truth.  Planted variants, each under an UNRELATED transcript so no
    text detector can pair them, with different bytes AND a different
    sample rate so byte classes, PCM compare (length mismatch), and the
    sample-count-framed energy detector all miss them by construction:

    - ``...u`` (every 3rd doc): the 16 kHz re-encode -- the exact
      2x linear upsample (multimodal.resample2x_s16, scale-by-2)
      floor-halved back to s16 range.  Canonicalization recovers the
      scale-2 stream up to the odd-sum LSB: measured J = 1.0 on every
      planted pair.
    - ``...w`` (every 4th doc): the same 16 kHz re-encode plus white
      noise at 40 dB SNR -- a noisy higher-rate re-master.  Measured
      J >= 0.647 vs the 0.286 cross-clip ceiling (RATE_JACCARD_T 0.45
      splits with >= 0.16 margin both sides).
    """
    from pyspark.sql import functions as F

    from locality_sensitive_hashing_spark.operators.multimodal import (
        resample2x_s16,
    )
    from locality_sensitive_hashing_spark.sources.tables import (
        CLIPS_SCHEMA,
        read_testdata,
    )

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.where(F.col("doc_id") < limit)

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                rng = np.random.default_rng([seed, doc_id, 17])
                sr, dur = 8000, 1000
                pcm = synth_env_pcm(rng, sr, dur)
                ints = np.clip(
                    np.round(pcm * 32767.0), -32768, 32767
                ).astype(np.int64)
                rows.append((
                    f"r{doc_id:08d}b",
                    A.encode_wav(ints / 32767.0, sr, "pcm_s16le"),
                    sr, dur, "pcm_s16le", str(text),
                ))
                up = resample2x_s16(ints)
                v = np.right_shift(up, 1)  # floor halve: legit s16 range
                if doc_id % 3 == 0:
                    rows.append((
                        f"r{doc_id:08d}u",
                        A.encode_wav(v / 32767.0, 16000, "pcm_s16le"),
                        16000, dur, "pcm_s16le",
                        f"republication {doc_id} re-encoded at sixteen k",
                    ))
                if doc_id % 4 == 0:
                    noisy = A.add_noise_at_snr(rng, v / 32767.0, 40.0)
                    vz = np.clip(
                        np.round(noisy * 32767.0), -32768, 32767
                    ).astype(np.int64)
                    rows.append((
                        f"r{doc_id:08d}w",
                        A.encode_wav(vz / 32767.0, 16000, "pcm_s16le"),
                        16000, dur, "pcm_s16le",
                        f"noisy high rate remaster {doc_id}",
                    ))
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                         "transcript"],
            )

    return docs.repartition(32, "doc_id").mapInPandas(synth, CLIPS_SCHEMA)
