"""Waveform input for the native front end (the HCopy source side).

Formats the reference recipe's extraction stage consumes
(examples/02train_MLP3_newbob_timit/prepare_timit/hcopy23mel_16k_0.sh:
SOURCEFORMAT=NOHEAD + BYTEORDER=VAX raw PCM16), plus RIFF WAV and the
HTK WAVEFORM file format (12-byte HTK header, sampSize=2), so a user can
point the recipe at whichever audio container they have.
"""

from __future__ import annotations

import struct

import numpy as np

from .htk import _read_header, stk_open


def read_raw(path: str, byte_order: str = "vax") -> np.ndarray:
    """SOURCEFORMAT=NOHEAD: bare PCM16 samples. BYTEORDER=VAX means
    little-endian (the HTK config name), anything else big-endian."""
    dt = "<i2" if byte_order.lower() in ("vax", "le", "little") else ">i2"
    with stk_open(path, "rb") as f:
        data = f.read()
    if len(data) % 2:
        raise ValueError(f"raw PCM16 file has odd byte count: {path}")
    return np.frombuffer(data, dtype=dt).astype(np.int16)


def read_wav(path: str) -> tuple:
    """RIFF WAV, PCM16 (first channel of multi-channel files).
    Returns (samples, sample_rate)."""
    with stk_open(path, "rb") as f:
        riff = f.read(12)
        if len(riff) != 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"Not a RIFF WAV file: {path}")
        fmt = None
        while True:
            head = f.read(8)
            if len(head) < 8:
                raise ValueError(f"WAV file missing data chunk: {path}")
            cid, size = head[:4], struct.unpack("<I", head[4:])[0]
            if cid == b"fmt ":
                fmt = f.read(size)
                if len(fmt) < 16:
                    raise ValueError(f"Truncated WAV fmt chunk: {path}")
            elif cid == b"data":
                raw = f.read(size)
                if len(raw) < size:
                    raise ValueError(f"Truncated WAV data chunk: {path}")
                break
            else:
                f.read(size + (size & 1))
        if fmt is None:
            raise ValueError(f"WAV file missing fmt chunk: {path}")
        audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
        if audio_fmt != 1 or bits != 16:
            raise ValueError(
                f"Only PCM16 WAV supported (fmt={audio_fmt}, bits={bits}): "
                f"{path}")
        samples = np.frombuffer(raw, dtype="<i2")
        if n_ch > 1:
            samples = samples[::n_ch]          # first channel
        return samples.astype(np.int16), rate


def read_htk_waveform(path: str, big_endian: bool = True) -> tuple:
    """HTK WAVEFORM file (sampleKind 0, sampSize 2, PCM16 samples).
    Returns (samples, sample_period_100ns)."""
    with stk_open(path, "rb") as f:
        hdr = _read_header(f, big_endian)
        if (hdr.sample_kind & 0o77) != 0 or hdr.sample_size != 2:
            raise ValueError(
                f"Not an HTK WAVEFORM file (kind={hdr.sample_kind}, "
                f"size={hdr.sample_size}): {path}")
        raw = f.read(2 * hdr.n_samples)
        if len(raw) != 2 * hdr.n_samples:
            raise ValueError(f"Truncated HTK waveform: {path}")
    bo = ">" if big_endian else "<"
    return np.frombuffer(raw, dtype=bo + "i2").astype(np.int16), \
        hdr.sample_period


def write_wav(path: str, samples: np.ndarray, rate: int) -> None:
    """PCM16 mono RIFF WAV writer (for toy corpora and tests)."""
    s = np.asarray(samples, np.int16)
    data = s.astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                      rate * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)))
        f.write(data)
