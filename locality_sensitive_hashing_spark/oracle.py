"""Single-process numpy oracle: the pipeline's ground truth.

Implements the full dedup dataflow in plain Python/numpy on one machine,
using the SAME kernels (:mod:`hashing`, :mod:`audio`) and the SAME
content-class semantics as the Spark pipeline (operators/textgroup.py):

    normalize -> text/audio content keys -> distinct-text detectors
    (MinHash banding, SimHash chunks, winnowed suffix-array) -> text-pair
    verification -> audio-class expansion (chain / within / cross edges)
    -> PCM verification -> union-find clustering.

It regenerates "the reference's bucket/cluster fixtures" (BASELINE.json)
-- the mount at /root/reference was empty this session (SURVEY.md section
0.1), so fixtures derive from the published semantics (MMDS sections
3.2-3.4; Broder 1997; Charikar 2002) at the pinned Config, which is the
agreement contract ("identical shingle-size/num-hashes/band-row config").

Every stage mirrors a Spark stage 1:1 (names match plans/pipeline.py) so
unit tests compare stage-by-stage, bit-for-bit.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from locality_sensitive_hashing_spark import audio as audio_mod
from locality_sensitive_hashing_spark import hashing as H
from locality_sensitive_hashing_spark.config import Config

INF = float("inf")
NEG_INF = float("-inf")


@dataclass
class OracleResult:
    keyed: pd.DataFrame  # clip_id, norm, text_key, audio_key
    texts: pd.DataFrame  # text_key, norm; audio_classes carries the
    # per-class decode metadata + quantized digest (same screen as Spark)
    shingles: pd.DataFrame  # text_key, shingles (sorted distinct int64 list)
    signatures: pd.DataFrame  # text_key, sig
    simhash: pd.DataFrame  # text_key, fingerprint
    buckets: pd.DataFrame  # text_key, band_id, band_hash
    dropped_buckets: pd.DataFrame  # band_id, band_hash, n_members
    candidates: pd.DataFrame  # id1, id2 (text keys), detectors
    text_verified: pd.DataFrame  # tk1, tk2, detectors, est_jaccard, hamming, lcs, text_ok
    audio_classes: pd.DataFrame  # text_key, audio_key, rep, n_members
    dropped_groups: pd.DataFrame  # text_key, n_classes (> cap)
    verified: pd.DataFrame  # id1,id2,kind,detectors,est_jaccard,teq,hamming,lcs,allclose,snr_db,is_dup
    clusters: pd.DataFrame  # clip_id, cluster_id
    stats: dict = field(default_factory=dict)


def _pairs_from_groups(groups: dict) -> set[tuple[str, str]]:
    pairs: set[tuple[str, str]] = set()
    for members in groups.values():
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def _class_meta(raw: bytes) -> tuple[bool, int, np.ndarray]:
    """(decode_ok, n_samples, digest) -- mirrors class_audio_meta_udf."""
    try:
        pcm, _ = audio_mod.decode_wav(raw)
        if pcm.size > 0:
            return True, int(pcm.size), audio_mod.pcm_digest(pcm)
    except Exception:
        pass
    return False, 0, np.empty(0, dtype=np.int64)


def _energy_profile(
    raw: bytes, a: np.ndarray, b: np.ndarray, prime: int
) -> tuple[bool, np.ndarray, np.ndarray]:
    """(e_ok, e_shingles, e_sig) -- mirrors the energy half of
    class_audio_meta_udf (operators/audio_lsh.py kernels, canonical-s16le
    payloads only)."""
    from locality_sensitive_hashing_spark.operators.audio_lsh import (
        _canonical_s16le_samples,
        frame_energy_symbols,
        shingle_encode,
    )

    ints = _canonical_s16le_samples(raw)
    if ints is None or ints.size == 0:
        return False, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    sh = shingle_encode(frame_energy_symbols(ints))
    sig = H.minhash_signature(sh.astype(np.uint64), a, b, prime)
    return True, sh, sig.astype(np.int64)


def _fingerprint_profile(raw: bytes) -> tuple[np.ndarray, int]:
    """(fp_codes, fp_active) -- mirrors the fingerprint half of
    class_audio_meta_udf (operators/audio_fingerprint.py kernels; the
    parse flag is the shared e_ok)."""
    from locality_sensitive_hashing_spark.operators.audio_fingerprint import (
        fingerprint_codes,
        frame_band_mags,
    )
    from locality_sensitive_hashing_spark.operators.audio_lsh import (
        _canonical_s16le_samples,
    )

    ints = _canonical_s16le_samples(raw)
    if ints is None or ints.size == 0:
        return np.empty(0, dtype=np.int64), 0
    return fingerprint_codes(frame_band_mags(ints))


def run_oracle(clips: pd.DataFrame, cfg: Config) -> OracleResult:
    """Run the whole dedup pipeline single-process over a clips DataFrame.

    ``clips`` columns: clip_id, bytes, sr_hz, dur_ms, codec, transcript
    (BASELINE.json input_hint schema).
    """
    a, b = H.hash_family(cfg)

    # --- content keys (stage: keyed) ---
    keyed_rows = []
    for r in clips.itertuples():
        norm = H.normalize_text(r.transcript)
        tk = hashlib.sha256(norm.encode("utf-8")).hexdigest()[:32]
        ak = hashlib.sha256(bytes(r.bytes)).hexdigest()[:32]
        keyed_rows.append((r.clip_id, norm, tk, ak))
    keyed = pd.DataFrame(keyed_rows, columns=["clip_id", "norm", "text_key", "audio_key"])
    blobs = dict(zip(clips["clip_id"], clips["bytes"]))

    # --- distinct texts + per-text signatures (stages: texts, signatures,
    #     fingerprints) ---
    texts = (
        keyed.groupby("text_key", as_index=False)["norm"].min()
        .sort_values("text_key").reset_index(drop=True)
    )
    norm_of = dict(zip(texts["text_key"], texts["norm"]))
    sh_rows, sig_rows, sim_rows, bucket_rows = [], [], [], []
    sigs: dict[str, np.ndarray] = {}
    fps: dict[str, int] = {}
    for tk, norm in norm_of.items():
        ss = H.shingle_set(norm, cfg.shingle_k, cfg.shingle_type)
        sig = H.minhash_signature(ss, a, b, cfg.modulo_prime)
        bh = H.band_hashes(sig, cfg.bands, cfg.rows_per_band)
        fp = H.simhash64(norm)
        sigs[tk] = sig
        fps[tk] = fp
        sh_rows.append((tk, ss.view(np.int64).tolist()))
        sig_rows.append((tk, sig.tolist()))
        sim_rows.append((tk, fp))
        for band_id, h in enumerate(bh.tolist()):
            bucket_rows.append((tk, band_id, h))
    shingles_df = pd.DataFrame(sh_rows, columns=["text_key", "shingles"])
    signatures_df = pd.DataFrame(sig_rows, columns=["text_key", "sig"])
    simhash_df = pd.DataFrame(sim_rows, columns=["text_key", "fingerprint"])
    buckets_df = pd.DataFrame(bucket_rows, columns=["text_key", "band_id", "band_hash"])

    # --- MinHash text candidates with bucket caps (O8-O10, O25) ---
    groups: dict[tuple[int, int], list[str]] = {}
    for tk, band_id, h in bucket_rows:
        groups.setdefault((band_id, h), []).append(tk)
    dropped = sorted(
        (band_id, h, len(m))
        for (band_id, h), m in groups.items()
        if len(m) > cfg.bucket_cap
    )
    kept = {k: m for k, m in groups.items() if 1 < len(m) <= cfg.bucket_cap}
    minhash_pairs = _pairs_from_groups(kept)
    dropped_df = pd.DataFrame(dropped, columns=["band_id", "band_hash", "n_members"])

    # --- SimHash text candidates (O12-O14) ---
    n_chunks = cfg.hamming_t + 1
    cgroups: dict[tuple[int, int], list[str]] = {}
    for tk in norm_of:
        for ci, cv in enumerate(H.simhash_chunks(fps[tk], n_chunks)):
            cgroups.setdefault((ci, cv), []).append(tk)
    ckept = {k: m for k, m in cgroups.items() if 1 < len(m) <= cfg.bucket_cap}
    simhash_pairs = {
        p
        for p in _pairs_from_groups(ckept)
        if H.hamming64(fps[p[0]], fps[p[1]]) <= cfg.hamming_t
    }

    # --- suffix-array anchor candidates (O15 blocking; LCS deferred) ---
    gram_len, window = H.sa_params(cfg)
    agroups: dict[int, list[str]] = {}
    for tk, norm in norm_of.items():
        for anc in H.winnow_anchors(norm, gram_len, window).tolist():
            agroups.setdefault(anc, []).append(tk)
    akept = {k: m for k, m in agroups.items() if 1 < len(m) <= cfg.bucket_cap}
    sa_pairs = _pairs_from_groups(akept)

    # --- union + text-pair verification (O16, O11, O20) ---
    all_pairs: dict[tuple[str, str], set[str]] = {}
    for pool, name in ((minhash_pairs, "minhash"), (simhash_pairs, "simhash"), (sa_pairs, "sa")):
        for p in pool:
            all_pairs.setdefault(p, set()).add(name)
    candidates_df = pd.DataFrame(
        [(p[0], p[1], sorted(d)) for p, d in sorted(all_pairs.items())],
        columns=["id1", "id2", "detectors"],
    )
    tv_rows = []
    for (tk1, tk2), dets in sorted(all_pairs.items()):
        est_j = float((sigs[tk1] == sigs[tk2]).mean())
        ham = H.hamming64(fps[tk1], fps[tk2])
        # exact LCS only where the verdict depends on it (same lazy rule
        # as operators/verify.py)
        lcs = -1
        if (
            "sa" in dets
            and est_j < cfg.jaccard_threshold
            and ham > cfg.hamming_t
        ):
            lcs = H.lcs_at_least(norm_of[tk1], norm_of[tk2], cfg.sa_min_len)
        text_ok = (
            est_j >= cfg.jaccard_threshold
            or ham <= cfg.hamming_t
            or lcs >= cfg.sa_min_len
        )
        tv_rows.append((tk1, tk2, sorted(dets), est_j, ham, lcs, bool(text_ok)))
    text_verified_df = pd.DataFrame(
        tv_rows,
        columns=["tk1", "tk2", "detectors", "est_jaccard", "hamming", "lcs", "text_ok"],
    )

    # --- audio classes + chain edges ---
    cls = (
        keyed.groupby(["text_key", "audio_key"])
        .agg(rep=("clip_id", "min"), n_members=("clip_id", "size"))
        .reset_index()
    )
    meta = {r.rep: _class_meta(bytes(blobs[r.rep])) for r in cls.itertuples()}
    emeta = {
        r.rep: _energy_profile(bytes(blobs[r.rep]), a, b, cfg.modulo_prime)
        for r in cls.itertuples()
    }
    cls["decode_ok"] = [meta[r][0] for r in cls["rep"]]
    cls["n_samples"] = [meta[r][1] for r in cls["rep"]]
    cls["digest"] = [meta[r][2].tolist() for r in cls["rep"]]
    cls["e_ok"] = [emeta[r][0] for r in cls["rep"]]
    cls["e_shingles"] = [emeta[r][1].tolist() for r in cls["rep"]]
    cls["e_sig"] = [emeta[r][2].tolist() for r in cls["rep"]]
    fpmeta = {r.rep: _fingerprint_profile(bytes(blobs[r.rep]))
              for r in cls.itertuples()}
    cls["fp_codes"] = [fpmeta[r][0].tolist() for r in cls["rep"]]
    cls["fp_active"] = [fpmeta[r][1] for r in cls["rep"]]
    classes_df = cls.sort_values(["text_key", "audio_key"]).reset_index(drop=True)
    n_classes = cls.groupby("text_key")["rep"].size().to_dict()
    dropped_groups_df = pd.DataFrame(
        sorted((tk, n) for tk, n in n_classes.items() if n > cfg.bucket_cap),
        columns=["text_key", "n_classes"],
    )
    class_decode_ok = {
        (r.text_key, r.audio_key): r.decode_ok for r in cls.itertuples()
    }

    ver_rows = []
    members = keyed.sort_values("clip_id").groupby(["text_key", "audio_key"])["clip_id"]
    for (tk, ak), ms in members:
        ids = ms.tolist()  # sorted; ids[0] is the class rep
        ok = class_decode_ok[(tk, ak)]
        for other in ids[1:]:  # star on the rep (diameter 2)
            ver_rows.append(
                (ids[0], other, "chain", ["exact"], 1.0, True, 0, -1,
                 ok, INF if ok else NEG_INF, ok)
            )

    def pcm(rep1: str, rep2: str) -> tuple[bool, float, bool]:
        """Digest-screened PCM verdict (same rule as operators/verify.py)."""
        ok1, n1, g1 = meta[rep1]
        ok2, n2, g2 = meta[rep2]
        if not (ok1 and ok2) or n1 != n2 or n1 == 0:
            return False, NEG_INF, False
        if (np.abs(g1 - g2) > 1).any():  # provable allclose failure
            return False, NEG_INF, False
        close, snr = audio_mod.pcm_compare(bytes(blobs[rep1]), bytes(blobs[rep2]))
        return close, snr, bool(close and snr >= cfg.snr_db)

    # within-group rep pairs
    reps_by_tk: dict[str, list[str]] = {}
    for r in cls.itertuples():
        reps_by_tk.setdefault(r.text_key, []).append(r.rep)
    for tk, reps in reps_by_tk.items():
        if not (1 < len(reps) <= cfg.bucket_cap):
            continue
        rs = sorted(reps)
        for i in range(len(rs)):
            for j in range(i + 1, len(rs)):
                close, snr, dup = pcm(rs[i], rs[j])
                ver_rows.append(
                    (rs[i], rs[j], "within", ["within_text"], 1.0, True, 0, -1,
                     close, snr, dup)
                )

    # cross-group rep pairs over passing text pairs
    for row in tv_rows:
        tk1, tk2, dets, est_j, ham, lcs, text_ok = row
        if not text_ok:
            continue
        if n_classes[tk1] > cfg.bucket_cap or n_classes[tk2] > cfg.bucket_cap:
            continue
        for ra in reps_by_tk[tk1]:
            for rb in reps_by_tk[tk2]:
                i1, i2 = (ra, rb) if ra < rb else (rb, ra)
                close, snr, dup = pcm(i1, i2)
                ver_rows.append(
                    (i1, i2, "cross", dets, est_j, False, ham, lcs, close, snr, dup)
                )

    # audio-content energy edges over distinct payloads (mirrors
    # operators/verify.py energy_content_edges: one feature row per
    # audio_key at its GLOBAL rep, MIN_PROFILE_SHINGLES floor at blocking,
    # tuple-band LSH at bucket_cap, exact shingle-Jaccard verdict)
    from locality_sensitive_hashing_spark.operators.audio_lsh import (
        JACCARD_THRESHOLD,
        MIN_PROFILE_SHINGLES,
    )

    ak_rep: dict[str, str] = {}
    for r in cls.itertuples():
        if r.e_ok and (r.audio_key not in ak_rep or r.rep < ak_rep[r.audio_key]):
            ak_rep[r.audio_key] = r.rep
    efeats = {
        rep: emeta[rep][1]
        for rep in ak_rep.values()
        if emeta[rep][1].size >= MIN_PROFILE_SHINGLES
    }
    r_pb = cfg.rows_per_band
    egroups: dict[tuple[int, tuple], list[str]] = {}
    for rep in efeats:
        sig = emeta[rep][2]
        for j in range(cfg.bands):
            egroups.setdefault(
                (j, tuple(sig[j * r_pb : (j + 1) * r_pb].tolist())), []
            ).append(rep)
    ekept = {k: m for k, m in egroups.items() if 1 < len(m) <= cfg.bucket_cap}
    n_energy_pairs = 0
    for e1, e2 in sorted(_pairs_from_groups(ekept)):
        s1, s2 = efeats[e1], efeats[e2]
        j = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
        n_energy_pairs += 1
        ver_rows.append(
            (e1, e2, "audio_content", ["energy"], float(j), False, -1, -1,
             False, NEG_INF, bool(j >= JACCARD_THRESHOLD))
        )

    # gain-invariant fingerprint edges over distinct payloads (mirrors
    # operators/verify.py gain_content_edges: same global reps, the
    # MIN_CODES/MIN_ACTIVE_FRAC floor, pigeonhole WINDOW-code blocking at
    # bucket_cap, equal-length alignment, exact-BER verdict)
    from locality_sensitive_hashing_spark.operators.audio_fingerprint import (
        BER_MAX,
        CODE_BITS,
        MIN_ACTIVE_FRAC,
        MIN_CODES,
        WINDOW,
    )

    fpfeats = {
        rep: fpmeta[rep][0]
        for rep in ak_rep.values()
        if fpmeta[rep][0].size >= MIN_CODES
        and fpmeta[rep][1] >= fpmeta[rep][0].size * MIN_ACTIVE_FRAC
    }
    fgroups: dict[tuple[int, int], list[str]] = {}
    for rep, codes in fpfeats.items():
        for w in range(codes.size - WINDOW + 1):
            key = 0
            for c in codes[w : w + WINDOW].tolist():
                key = key * (1 << CODE_BITS) + c
            fgroups.setdefault((w, key), []).append(rep)
    fkept = {k: m for k, m in fgroups.items() if 1 < len(m) <= cfg.bucket_cap}
    n_gain_pairs = 0
    for g1, g2 in sorted(_pairs_from_groups(fkept)):
        c1, c2 = fpfeats[g1], fpfeats[g2]
        if c1.size != c2.size:
            continue
        bits = sum(
            int(v).bit_count() for v in np.bitwise_xor(c1, c2).tolist()
        )
        ber = bits / (CODE_BITS * c1.size)
        n_gain_pairs += 1
        ver_rows.append(
            (g1, g2, "audio_gain", ["fingerprint"], 1.0 - ber, False, -1, -1,
             False, NEG_INF, bool(ber <= BER_MAX))
        )

    verified_df = pd.DataFrame(
        ver_rows,
        columns=["id1", "id2", "kind", "detectors", "est_jaccard", "teq",
                 "hamming", "lcs", "allclose", "snr_db", "is_dup"],
    )

    # --- union-find clustering; cluster_id = min clip_id (O21-O22) ---
    ids = clips["clip_id"].tolist()
    parent = {cid: cid for cid in ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for row in ver_rows:
        if row[-1]:
            r1, r2 = find(row[0]), find(row[1])
            if r1 != r2:
                lo, hi = (r1, r2) if r1 < r2 else (r2, r1)
                parent[hi] = lo
    clusters_df = pd.DataFrame(
        sorted((cid, find(cid)) for cid in ids), columns=["clip_id", "cluster_id"]
    )

    stats = {
        "n_clips": len(ids),
        "n_texts": len(norm_of),
        "n_audio_classes": len(cls),
        "n_minhash_pairs": len(minhash_pairs),
        "n_simhash_pairs": len(simhash_pairs),
        "n_sa_pairs": len(sa_pairs),
        "n_energy_pairs": n_energy_pairs,
        "n_gain_pairs": n_gain_pairs,
        "n_text_candidates": len(all_pairs),
        "n_verified_edges": len(ver_rows),
        "n_dup_edges": int(verified_df["is_dup"].sum()) if len(verified_df) else 0,
        "n_dropped_buckets": len(dropped),
        "n_dropped_groups": len(dropped_groups_df),
        "n_clusters": clusters_df["cluster_id"].nunique(),
    }
    return OracleResult(
        keyed=keyed,
        texts=texts,
        shingles=shingles_df,
        signatures=signatures_df,
        simhash=simhash_df,
        buckets=buckets_df,
        dropped_buckets=dropped_df,
        candidates=candidates_df,
        text_verified=text_verified_df,
        audio_classes=classes_df,
        dropped_groups=dropped_groups_df,
        verified=verified_df,
        clusters=clusters_df,
        stats=stats,
    )
