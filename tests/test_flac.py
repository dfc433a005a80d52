"""FLAC codec coverage (sources/flac.py).

Evidence classes, mirroring the sibling codec test files:
1. encode/decode option-matrix round-trips — bps 8/16/24, all four stereo
   modes, partial final blocks, Rice partition orders, escape-to-raw
   partitions, constant / verbatim / fixed / LPC subframes, wasted bits;
   encoder and decoder implement the spec independently (bit-writer +
   residual search vs bit-walk reader + cumulative-sum restore);
2. a HAND-ASSEMBLED bitstream golden built bit-by-bit in this file with
   its own writer — a matched encoder/decoder bug cannot satisfy it;
3. the intrinsic MD5 oracle: STREAMINFO's embedded PCM checksum is
   produced by the writer from the raw samples BEFORE encoding and
   verified by the reader from the decoded samples AFTER — tampering
   with it must fail the decode;
4. error paths feeding the operator-level skip+flag policy (corrupt /
   truncated / reserved-form streams -> ValueError);
5. the Spark seam: FLAC rows decode through the same audio UDFs as WAV
   and cluster with their WAV-encoded twins (codec-independent
   fingerprint).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from text_dedup_spark.sources.flac import (
    crc8,
    crc16,
    decode_flac,
    decode_flac_pcm,
    encode_flac,
)

RNG = np.random.RandomState(11)


def _smooth(n, amp=8000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    return np.clip(
        np.rint(amp * np.sin(t / 29.0) + amp / 4 * np.sin(t / 7.0 + 1)
                + rng.randint(-30, 30, n)),
        -32768, 32767,
    ).astype(np.int64)


def _ar2(n, seed=2, scale=60.0):
    rng = np.random.RandomState(seed)
    x = np.zeros(n)
    e = rng.normal(0, scale, n)
    for i in range(2, n):
        x[i] = 1.6 * x[i - 1] - 0.81 * x[i - 2] + e[i]
    return np.clip(np.rint(x), -30000, 30000).astype(np.int64)


# --------------------------------------------------------- 1. round-trips


@pytest.mark.parametrize("block_size", [192, 777, 4096])
def test_mono_roundtrip_blocks(block_size):
    s = _smooth(5000)
    b = encode_flac(s, rate=16000, bps=16, block_size=block_size)
    pcm, rate, bps = decode_flac_pcm(b)
    assert rate == 16000 and bps == 16
    assert np.array_equal(pcm[:, 0], s)
    # lossless compression actually compresses a smooth signal
    assert len(b) < 2 * len(s)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_modes_roundtrip(mode):
    s = _smooth(4000, seed=3)
    st = np.stack([s, (s * 0.7).astype(np.int64) + RNG.randint(-5, 5, len(s))], axis=1)
    b = encode_flac(st, rate=44100, bps=16, block_size=1024, stereo_mode=mode)
    pcm, rate, _ = decode_flac_pcm(b)
    assert rate == 44100
    assert np.array_equal(pcm, st)


def test_mid_side_negative_odd_samples():
    # mid/side reconstruction must be exact for odd sums and negatives
    st = np.array([[3, 0], [-3, 0], [-7, 4], [1, -2], [32767, -32768],
                   [-1, -1], [0, 1]], dtype=np.int64)
    st = np.tile(st, (40, 1))
    b = encode_flac(st, bps=16, block_size=64, stereo_mode="mid_side",
                    force_verbatim=True)
    assert np.array_equal(decode_flac_pcm(b)[0], st)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bps_matrix_verbatim_and_fixed(bps):
    lim = 1 << (bps - 1)
    noise = RNG.randint(-lim, lim, 500).astype(np.int64)
    for force in (True, False):
        b = encode_flac(noise, bps=bps, block_size=128, force_verbatim=force)
        pcm, _, got_bps = decode_flac_pcm(b)
        assert got_bps == bps
        assert np.array_equal(pcm[:, 0], noise)


def test_constant_and_all_zero():
    c = np.full(1000, -12345, dtype=np.int64)
    assert np.array_equal(decode_flac_pcm(encode_flac(c))[0][:, 0], c)
    z = np.zeros(300, dtype=np.int64)
    assert np.array_equal(decode_flac_pcm(encode_flac(z))[0][:, 0], z)


def test_partition_orders():
    s = _smooth(4096, seed=5)
    for po in (1, 2, 3, 4):
        b = encode_flac(s, block_size=1024, part_order=po)
        assert np.array_equal(decode_flac_pcm(b)[0][:, 0], s)


def test_escape_to_raw_partition():
    # near-full-range alternating samples make raw cheaper than any Rice
    # parameter, so the encoder's search must pick the escape form and the
    # decoder must read it back
    s = np.where(np.arange(600) % 2 == 0, 32000, -32000).astype(np.int64)
    s += RNG.randint(-400, 400, 600)
    b = encode_flac(s, block_size=256, lpc_order=0)
    assert np.array_equal(decode_flac_pcm(b)[0][:, 0], s)


def test_lpc_subframe_selected_and_exact():
    from text_dedup_spark.sources import flac as flac_mod

    types = []
    orig = flac_mod._read_subframe

    def spy(br, blocksize, bps):
        p0 = br.p
        br.read(1)
        types.append(br.read(6))
        br.p = p0
        return orig(br, blocksize, bps)

    flac_mod._read_subframe = spy
    try:
        s = _ar2(8192)
        b = encode_flac(s, block_size=2048, lpc_order=8)
        pcm, _, _ = decode_flac_pcm(b)
    finally:
        flac_mod._read_subframe = orig
    assert np.array_equal(pcm[:, 0], s)
    assert any(t >= 32 for t in types), f"no LPC subframe chosen: {types}"


def test_wasted_bits_roundtrip():
    s = (RNG.randint(-500, 500, 2000) * 16).astype(np.int64)  # 4 wasted bits
    b = encode_flac(s, block_size=512, lpc_order=0)
    b2 = encode_flac(s >> 4, block_size=512, lpc_order=0)
    assert np.array_equal(decode_flac_pcm(b)[0][:, 0], s)
    # wasted-bits coding should make the shifted-up signal no bigger than
    # its shifted-down twin (plus the unary flag overhead)
    assert len(b) <= len(b2) + 64


def test_single_partial_block_and_tiny_streams():
    for n in (1, 3, 5, 100):
        s = _smooth(n, seed=n)
        b = encode_flac(s, block_size=4096)
        assert np.array_equal(decode_flac_pcm(b)[0][:, 0], s)


def test_encoder_deterministic():
    s = _smooth(3000, seed=8)
    assert encode_flac(s) == encode_flac(s)


def test_decode_flac_mono16_contract():
    # stereo 24-bit downmixes and rescales to the int16-mono contract
    s = _smooth(2000, amp=800000, seed=9)
    s = np.clip(s, -(1 << 23), (1 << 23) - 1)
    st = np.stack([s, s], axis=1)
    mono, rate = decode_flac(encode_flac(st, rate=22050, bps=24))
    assert mono.dtype == np.int16 and rate == 22050
    expect = np.clip(np.rint(s / 256.0), -32768, 32767).astype(np.int16)
    assert np.array_equal(mono, expect)


# ------------------------------------------- 2. hand-assembled golden


class _HandWriter:
    """Independent MSB-first bit writer (deliberately NOT the module's)."""

    def __init__(self):
        self.v = 0
        self.n = 0

    def put(self, val, bits):
        self.v = (self.v << bits) | (val & ((1 << bits) - 1))
        self.n += bits

    def bytes(self):
        assert self.n % 8 == 0
        return self.v.to_bytes(self.n // 8, "big") if self.n else b""


def test_hand_assembled_stream_golden():
    """A FLAC stream built bit-by-bit from RFC 9639 alone: one frame,
    blocksize 4, a FIXED order-1 subframe with Rice-coded residual +3.
    Decoding it proves the reader against the spec, not the encoder."""
    samples = [100, 103, 106, 109]
    md5 = hashlib.md5(struct.pack("<4h", *samples)).digest()

    streaminfo = struct.pack(">HH", 4, 4) + b"\x00" * 6
    packed = (8000 << 44) | (0 << 41) | (15 << 36) | 4  # rate, 1ch, 16bps, 4
    streaminfo += packed.to_bytes(8, "big") + md5
    meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    hdr = _HandWriter()
    hdr.put(0b11111111111110, 14)  # sync
    hdr.put(0, 1)                  # reserved
    hdr.put(0, 1)                  # fixed-blocksize strategy
    hdr.put(6, 4)                  # blocksize: 8-bit at end of header
    hdr.put(0, 4)                  # rate: from STREAMINFO
    hdr.put(0, 4)                  # 1 channel, independent
    hdr.put(4, 3)                  # 16-bit samples
    hdr.put(0, 1)                  # reserved
    hdr.put(0, 8)                  # coded frame number 0
    hdr.put(3, 8)                  # blocksize - 1
    hdr_bytes = hdr.bytes()

    body = _HandWriter()
    body.put(0, 1)       # subframe pad bit
    body.put(9, 6)       # FIXED, order 1
    body.put(0, 1)       # no wasted bits
    body.put(100, 16)    # warmup sample
    body.put(0, 2)       # residual method 0 (4-bit Rice)
    body.put(0, 4)       # partition order 0
    body.put(2, 4)       # rice parameter 2
    for _ in range(3):   # residual +3 -> zigzag 6 -> q=1 ('01'), low '10'
        body.put(0b0110, 4)
    pad = (-body.n) % 8
    if pad:
        body.put(0, pad)
    frame = hdr_bytes + bytes([crc8(hdr_bytes)]) + body.bytes()
    frame += crc16(frame).to_bytes(2, "big")

    data = b"fLaC" + meta + frame
    pcm, rate, bps = decode_flac_pcm(data)
    assert rate == 8000 and bps == 16
    assert pcm[:, 0].tolist() == samples


# ------------------------------------------------ 3. intrinsic MD5 oracle


def test_md5_oracle_catches_tampering():
    s = _smooth(1500, seed=12)
    b = bytearray(encode_flac(s, block_size=512))
    # STREAMINFO MD5 lives at bytes [8+18, 8+34) of the metadata block
    b[8 + 20] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac_pcm(bytes(b))


def test_frame_corruption_raises():
    s = _smooth(1500, seed=13)
    b = encode_flac(s, block_size=512)
    for flip in (len(b) - 5, len(b) // 2):
        bb = bytearray(b)
        bb[flip] ^= 0x10
        with pytest.raises(ValueError):
            decode_flac_pcm(bytes(bb))


# ------------------------------------------------------- 4. error paths


def test_error_paths():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac_pcm(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_flac_pcm(b"fLaC\x80\x00\x00\x22" + b"\x00" * 10)  # truncated
    s = _smooth(400, seed=14)
    b = encode_flac(s, block_size=256)
    with pytest.raises(ValueError):
        decode_flac_pcm(b[: len(b) - 7])  # truncated mid-frame
    # metadata-only stream (no frames)
    with pytest.raises(ValueError, match="no frames"):
        decode_flac_pcm(b[: b.index(b"\xff\xf8")])


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="empty"):
        encode_flac(np.zeros(0, dtype=np.int64))
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([40000]), bps=16)
    with pytest.raises(ValueError, match="bps"):
        encode_flac(np.array([1]), bps=12)


# --------------------------------------------------------- 5. Spark seam


def test_flac_through_audio_udfs(spark):
    """FLAC rows decode through the same seam as WAV, and a FLAC clip
    clusters with its WAV-encoded twin — the fingerprint is
    codec-independent because both decode to identical PCM."""
    from text_dedup_spark.functions.media_udf import (
        audio_meta_table,
        encode_wav,
        media_near_dup_assignments,
    )

    t = np.arange(16000, dtype=np.float64)
    base = (np.sin(2 * np.pi * 440 * t / 16000) * 12000).astype(np.int16)
    other = (RNG.randn(16000) * 9000).astype(np.int16)
    df = spark.createDataFrame(
        [
            (0, encode_flac(base.astype(np.int64), rate=16000)),
            (1, encode_wav(base, rate=16000)),
            (2, encode_flac(other.astype(np.int64), rate=16000)),
        ],
        "clip_id long, bytes binary",
    )
    meta = audio_meta_table(df)
    rows = {r["clip_id"]: r for r in meta.collect()}
    assert rows[0]["sample_rate"] == 16000 and rows[0]["n_samples"] == 16000
    # identical PCM -> identical fingerprint, regardless of container
    assert rows[0]["afp"] == rows[1]["afp"]
    assigns = media_near_dup_assignments(meta, "afp", "clip_id")
    pairs = {(r["clip_id"], r["component"]) for r in assigns.collect()}
    assert (1, 0) in pairs
    assert all(cid != 2 for cid, _ in pairs)


def test_sniff_format_flac():
    from text_dedup_spark.sources.png import sniff_format

    b = encode_flac(_smooth(64, seed=1))
    assert sniff_format(b) == "flac"
    assert sniff_format(b"fLa") is None
