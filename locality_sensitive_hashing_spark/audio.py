"""Pure-numpy WAV/PCM audio kernels (synth, decode, allclose/SNR verify).

The audio axis is new relative to the text-only reference
(BASELINE.json graft payload "audio"); the per-row invariant is pinned by
BASELINE.json input_hint: decoded-PCM comparison via ``np.allclose`` plus
SNR >= 30 dB. No soundfile/scipy in the sandbox (SURVEY.md Appendix A), so
RIFF/WAV containers are built and parsed by hand; supported codecs are
``pcm_s16le`` (format tag 1, 16-bit) and ``pcm_f32le`` (format tag 3,
float32), matching FIXTURES.md.

Shared by the fixture generator, the numpy oracle, and the Spark Arrow UDF
in operators/audio_verify.py (same-module import on driver and executors).
"""

from __future__ import annotations

import struct

import numpy as np

SUPPORTED_CODECS = ("pcm_s16le", "pcm_f32le")
# quantization step of s16 is 2^-15 ~ 3.05e-5; atol leaves headroom for one
# re-quantization round-trip while still failing the ~25-30 dB negatives.
ALLCLOSE_ATOL = 1e-3
ALLCLOSE_RTOL = 0.0


def encode_wav(pcm: np.ndarray, sr_hz: int, codec: str) -> bytes:
    """Serialize float PCM in [-1, 1] to a canonical 44-byte-header WAV."""
    pcm = np.asarray(pcm, dtype=np.float64)
    if codec == "pcm_s16le":
        data = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2").tobytes()
        fmt_tag, bits = 1, 16
    elif codec == "pcm_f32le":
        data = pcm.astype("<f4").tobytes()
        fmt_tag, bits = 3, 32
    else:
        raise ValueError(f"unsupported codec {codec!r}")
    block = bits // 8  # mono
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        fmt_tag,
        1,  # channels
        sr_hz,
        sr_hz * block,
        block,
        bits,
        b"data",
        len(data),
    )
    return hdr + data


def _wav_chunks(raw: bytes) -> tuple[int, int, int, bytes]:
    """Chunk walk shared by the decoders: (fmt_tag, bits, sr_hz, data).

    Walks chunks properly (tolerates extra chunks between fmt and data).
    Raises ValueError on malformed input.
    """
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt_tag = bits = sr_hz = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, _ch, sr_hz, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_tag is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return fmt_tag, bits, int(sr_hz), data


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAV blob -> (float64 PCM in [-1, 1], sample rate).

    Raises ValueError on malformed input or unsupported format tags.
    """
    fmt_tag, bits, sr_hz, data = _wav_chunks(raw)
    if fmt_tag == 1 and bits == 16:
        pcm = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32767.0
    elif fmt_tag == 3 and bits == 32:
        pcm = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(f"unsupported wav format tag={fmt_tag} bits={bits}")
    return pcm, int(sr_hz)


def decode_wav_s16(raw: bytes) -> tuple[np.ndarray, int]:
    """Integer-sample decode: (int64 s16 samples, sample rate).

    pcm_s16le ONLY — integer-exact kernels (zero crossings, DC sum,
    integer peak) that a DuckDB byte-arithmetic oracle replays
    bit-for-bit need the raw sample values, not the /32767 floats.  A
    tag-3 float blob raises ValueError here by design (the s16-only
    fixture contract documented at the audio oracles).
    """
    fmt_tag, bits, sr_hz, data = _wav_chunks(raw)
    if fmt_tag != 1 or bits != 16:
        raise ValueError(f"integer decode needs pcm_s16le, got tag={fmt_tag} bits={bits}")
    return np.frombuffer(data, dtype="<i2").astype(np.int64), sr_hz


def pcm_compare(raw1: bytes, raw2: bytes) -> tuple[bool, float]:
    """Decoded-PCM duplicate check: (allclose, snr_db).

    BASELINE.json per-row invariant: dup iff np.allclose after alignment
    AND SNR = 10*log10(sum(s^2) / sum((s - s')^2)) >= threshold. Alignment
    here = equal decoded length (fixture dups are sample-aligned); a length
    mismatch is a non-dup (snr = -inf). Decode errors also yield non-dup.
    """
    if raw1 == raw2:
        # byte-identical fast path: same decode, zero error -> SNR inf
        try:
            p, _ = decode_wav(raw1)
        except (ValueError, struct.error):
            return False, float("-inf")
        return (False, float("-inf")) if p.size == 0 else (True, float("inf"))
    try:
        p1, _ = decode_wav(raw1)
        p2, _ = decode_wav(raw2)
    except (ValueError, struct.error):
        return False, float("-inf")
    if p1.size != p2.size or p1.size == 0:
        return False, float("-inf")
    err = p1 - p2
    num = float(np.sum(p1 * p1))
    den = float(np.sum(err * err))
    snr = float("inf") if den == 0.0 else 10.0 * np.log10(num / den) if num > 0 else float("-inf")
    close = bool(np.allclose(p1, p2, rtol=ALLCLOSE_RTOL, atol=ALLCLOSE_ATOL))
    return close, snr


DIGEST_K = 64


def pcm_digest(pcm: np.ndarray, atol: float = ALLCLOSE_ATOL,
               k: int = DIGEST_K) -> np.ndarray:
    """Quantized sample digest: k evenly-spaced samples, floor-quantized
    to 2*atol units (int64).

    Screening bound (used JVM-side in operators/verify.py): for samples a,
    b with q = floor(x / (2*atol)), |q_a - q_b| >= 2 implies
    |a - b| > (|q_a - q_b| - 1) * 2*atol >= 2*atol > atol, i.e. the pair
    PROVABLY fails np.allclose -- a sound rejector, never a false reject.
    """
    if pcm.size == 0:
        return np.empty(0, dtype=np.int64)
    pos = (np.arange(k, dtype=np.int64) * pcm.size) // k
    return np.floor(pcm[pos] / (2.0 * atol)).astype(np.int64)


def synth_pcm(rng: np.random.Generator, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic test tone: 2-4 sines + Gaussian noise, peak-normalized."""
    n = int(sr_hz * dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / sr_hz
    pcm = np.zeros(n)
    for _ in range(int(rng.integers(2, 5))):
        f = float(rng.uniform(80.0, min(3800.0, sr_hz / 2 - 100)))
        amp = float(rng.uniform(0.2, 0.6))
        phase = float(rng.uniform(0, 2 * np.pi))
        pcm += amp * np.sin(2 * np.pi * f * t + phase)
    pcm += rng.normal(0, 0.01, n)
    peak = np.abs(pcm).max()
    return pcm * (0.9 / peak) if peak > 0 else pcm


def add_noise_at_snr(
    rng: np.random.Generator, pcm: np.ndarray, snr_db: float
) -> np.ndarray:
    """Return pcm + white noise scaled to an exact target SNR (dB)."""
    noise = rng.normal(0, 1.0, pcm.size)
    sig_p = float(np.sum(pcm * pcm))
    noise_p = float(np.sum(noise * noise))
    scale = np.sqrt(sig_p / (noise_p * 10 ** (snr_db / 10.0)))
    return pcm + noise * scale
