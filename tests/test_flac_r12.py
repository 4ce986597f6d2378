"""FLAC codec pins (r12): round trips through the real encoder,
hand-built frames for the decoder paths the encoder never emits (LPC,
stereo decorrelation, Rice2, partitions, wasted bits, raw escapes),
and the fail-loud contract."""

import hashlib
import struct

import pytest

from faconne_spark.operators.multimodal import (
    _FlacBitReader,
    _FlacBitWriter,
    _flac_crc8,
    _flac_crc16,
    _flac_utf8_decode,
    _flac_utf8_encode,
    _flac_zigzag,
    flac_decode,
    flac_encode,
)


def _roundtrip(samples, rate=8000):
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    chans, got_rate, bps = flac_decode(flac_encode(pcm, rate))
    assert got_rate == rate and bps == 16 and len(chans) == 1
    assert chans[0] == list(samples)


def test_roundtrip_shapes():
    _roundtrip([0] * 64)                      # CONSTANT
    _roundtrip([-32768, 32767] * 50)          # alternating extremes
    _roundtrip([-6000 + 13 * i for i in range(300)])   # ramp (FIXED 2)
    _roundtrip([((i * 2654435761) % 65536) - 32768 for i in range(5000)])
    _roundtrip([7])                           # single sample
    _roundtrip([])                            # empty stream


def test_utf8_number_coding():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF,
              0x200000, 0x3FFFFFF, 0x4000000, (1 << 36) - 1]:
        enc = _flac_utf8_encode(n)
        br = _FlacBitReader(enc)
        assert _flac_utf8_decode(br) == n, n


def _write_frame_header(w, bs, chan_code, start_pos_bytes):
    """Byte-aligned frame header with explicit 16-bit blocksize."""
    w.write(0b11111111111110, 14)
    w.write(0, 2)               # reserved + fixed blocking
    w.write(0b0111, 4)          # 16-bit blocksize-1 follows
    w.write(0, 4)               # rate from STREAMINFO
    w.write(chan_code, 4)
    w.write(0b100, 3)           # 16 bps
    w.write(0, 1)
    w.write(_flac_utf8_encode(0)[0], 8)
    w.write(bs - 1, 16)
    header = bytes(w.buf[start_pos_bytes:])
    w.write(_flac_crc8(header), 8)


def _write_rice_residual(w, res, k, method=0, po=0, bs=None, order=0):
    pbits = 4 if method == 0 else 5
    w.write(method, 2)
    w.write(po, 4)
    idx = 0
    for p in range(1 << po):
        count = (bs >> po) - (order if p == 0 else 0)
        w.write(k, pbits)
        for r in res[idx : idx + count]:
            u = _flac_zigzag(r)
            w.write_unary(u >> k)
            w.write(u & ((1 << k) - 1), k)
        idx += count


def _stream(frame_builder, nchan=1, bps=16, n_total=None, pcm_md5=None):
    """Wrap hand-built frame bytes in fLaC + STREAMINFO."""
    frames = frame_builder
    sw = _FlacBitWriter()
    sw.write(1, 1)
    sw.write(0, 7)
    sw.write(34, 24)
    sw.write(0, 16); sw.write(0, 16); sw.write(0, 24); sw.write(0, 24)
    sw.write(8000, 20)
    sw.write(nchan - 1, 3)
    sw.write(bps - 1, 5)
    sw.write(n_total or 0, 36)
    md5 = pcm_md5 or b"\x00" * 16
    return b"fLaC" + sw.getvalue() + md5 + frames


def test_lpc_subframe():
    """Hand-built LPC order-2 subframe: coefs [3, -1], shift 1 —
    x[i] = r[i] + ((3*x[i-1] - x[i-2]) >> 1)."""
    bs = 16
    warm = [100, 110]
    res = [2, -3, 1, 0, 5, -5, 4, -1, 0, 2, -2, 3, 1, -4]
    w = _FlacBitWriter()
    _write_frame_header(w, bs, 0, 0)
    w.write(0, 1)
    w.write(0b100001, 6)        # LPC order 2
    w.write(0, 1)               # no wasted bits
    for s in warm:
        w.write(s, 16)
    w.write(12 - 1, 4)          # precision 12
    w.write(1, 5)               # shift 1
    w.write(3, 12)
    w.write(-1, 12)
    _write_rice_residual(w, res, k=2, bs=bs, order=2)
    w.align()
    frame = w.getvalue()
    frame += struct.pack(">H", _flac_crc16(frame))
    chans, _, _ = flac_decode(_stream(frame, n_total=bs))
    want = list(warm)
    for r in res:
        want.append(r + ((3 * want[-1] - want[-2]) >> 1))
    assert chans[0] == want


def _stereo_stream(chan_code, ch_a, ch_b, bps_a, bps_b):
    bs = len(ch_a)
    w = _FlacBitWriter()
    _write_frame_header(w, bs, chan_code, 0)
    for samples, bps in ((ch_a, bps_a), (ch_b, bps_b)):
        w.write(0, 1)
        w.write(0b000001, 6)    # VERBATIM
        w.write(0, 1)
        for s in samples:
            w.write(s, bps)
    w.align()
    frame = w.getvalue()
    frame += struct.pack(">H", _flac_crc16(frame))
    return _stream(frame, nchan=2, n_total=bs)


def test_stereo_decorrelation_all_modes():
    left = [100, -200, 300, 4000, -32768, 32767, 0, 17]
    right = [90, -210, 305, 3990, -32767, 32760, -1, 20]
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    # left/side
    chans, _, _ = flac_decode(_stereo_stream(8, left, side, 16, 17))
    assert chans == [left, right]
    # right/side
    chans, _, _ = flac_decode(_stereo_stream(9, side, right, 17, 16))
    assert chans == [left, right]
    # mid/side
    chans, _, _ = flac_decode(_stereo_stream(10, mid, side, 16, 17))
    assert chans == [left, right]


def test_wasted_bits_partitions_rice2_and_raw_escape():
    """One frame exercising: wasted bits (order-0 FIXED), partition
    order 1, the 5-bit Rice2 method, and a raw-escape partition."""
    bs = 8
    vals = [4, -8, 12, 0, -16, 8, 4, -4]     # all share one wasted bit
    shifted = [v >> 1 for v in vals]
    w = _FlacBitWriter()
    _write_frame_header(w, bs, 0, 0)
    w.write(0, 1)
    w.write(0b001000, 6)        # FIXED order 0
    w.write(1, 1)               # wasted-bits flag
    w.write(1, 1)               # unary 0 -> wasted = 1
    w.write(0b01, 2)            # Rice2: 5-bit params
    w.write(1, 4)               # partition order 1
    w.write(2, 5)               # partition 1: k=2
    for r in shifted[:4]:
        u = _flac_zigzag(r)
        w.write_unary(u >> 2)
        w.write(u & 3, 2)
    w.write(0b11111, 5)         # partition 2: escape
    w.write(6, 5)               # 6-bit raw residuals
    for r in shifted[4:]:
        w.write(r, 6)
    w.align()
    frame = w.getvalue()
    frame += struct.pack(">H", _flac_crc16(frame))
    chans, _, _ = flac_decode(_stream(frame, n_total=bs))
    assert chans[0] == vals


def test_md5_verification_catches_tampering():
    samples = [-6000 + 13 * i for i in range(100)]
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    enc = bytearray(flac_encode(pcm))
    # STREAMINFO md5 is bytes 8+18 .. 8+34 of the stream
    assert hashlib.md5(pcm).digest() == bytes(enc[26:42])
    enc[26] ^= 0xFF
    with pytest.raises(ValueError, match="MD5 mismatch"):
        flac_decode(bytes(enc))


def test_fail_loud_paths():
    samples = [((i * 37) % 200) - 100 for i in range(64)]
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    good = flac_encode(pcm)
    with pytest.raises(ValueError, match="fLaC marker"):
        flac_decode(b"RIFF" + good[4:])
    with pytest.raises(ValueError, match="metadata truncated"):
        flac_decode(good[:6])
    # corrupt the frame-header CRC-8 byte (frame starts at 42; header
    # is 32 bits fixed + 1 utf8 byte + 8-bit blocksize? -> locate by
    # flipping the byte right before the first subframe: brute force a
    # byte in the header region and expect SOME loud failure
    bad = bytearray(good)
    bad[42 + 4] ^= 0x01          # frame number byte -> CRC-8 mismatch
    with pytest.raises(ValueError, match="CRC-8 mismatch"):
        flac_decode(bytes(bad))
    bad = bytearray(good)
    bad[-1] ^= 0x01              # last CRC-16 byte
    with pytest.raises(ValueError, match="CRC-16 mismatch"):
        flac_decode(bytes(bad))


def test_reserved_codes_fail_loud():
    # blocksize code 0
    w = _FlacBitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(0b0000, 4)          # reserved blocksize code
    w.write(0, 4)
    w.write(0, 4)
    w.write(0b100, 3)
    w.write(0, 1)
    w.write(0, 8)
    header = w.getvalue()
    w.write(_flac_crc8(header), 8)
    with pytest.raises(ValueError, match="blocksize code 0"):
        flac_decode(_stream(w.getvalue()))
    # channel count mismatch vs STREAMINFO
    w = _FlacBitWriter()
    _write_frame_header(w, 4, 3, 0)   # claims 4 channels
    with pytest.raises(ValueError, match="channel count"):
        flac_decode(_stream(w.getvalue(), nchan=1))


def test_partition_order_must_divide_blocksize():
    bs = 6                       # not divisible by 4
    w = _FlacBitWriter()
    _write_frame_header(w, bs, 0, 0)
    w.write(0, 1)
    w.write(0b001000, 6)
    w.write(0, 1)
    w.write(0b00, 2)
    w.write(2, 4)                # partition order 2 -> 4 partitions
    w.align()
    frame = w.getvalue()
    frame += struct.pack(">H", _flac_crc16(frame))
    with pytest.raises(ValueError, match="does not divide"):
        flac_decode(_stream(frame, n_total=bs))


def test_total_samples_contract():
    pcm = struct.pack("<4h", 1, 2, 3, 4)
    enc = bytearray(flac_encode(pcm))
    # STREAMINFO total-samples field: last 4.5 bytes before md5 —
    # flip the low byte (offset 8+17 = 25)
    enc[25] ^= 0x01
    with pytest.raises(ValueError, match="STREAMINFO says"):
        flac_decode(bytes(enc))


# --------------------- animated GIF pins (same r12 codec wave)


def test_gif_animated_mixed_sizes_and_gce():
    from faconne_spark.operators.multimodal import (
        gif_encode_animated,
        gif_frames,
    )

    frames = [
        (8, 8, bytes([5] * 64)),
        (16, 8, bytes([9] * 128)),   # wider later frame
        (8, 16, bytes([1] * 128)),
    ]
    out = gif_frames(gif_encode_animated(frames, delay_cs=4))
    assert [(w, h) for _, _, w, h, _ in out] == [(8, 8), (16, 8), (8, 16)]
    assert out[1][4] == bytes([9] * 128)


def test_gif_frames_fail_loud():
    import pytest as _pytest

    from faconne_spark.operators.multimodal import (
        gif_encode_animated,
        gif_frames,
    )

    good = gif_encode_animated([(8, 8, bytes(64))])
    with _pytest.raises(ValueError, match="not a GIF"):
        gif_frames(b"NOTG" + good[4:])
    with _pytest.raises(ValueError, match="without trailer"):
        gif_frames(good[:-1])
    bad = bytearray(good)
    # corrupt the image-separator byte into an unknown block code
    # (search past the 768-byte global color table, whose gray-44
    # triple also contains 0x2C bytes)
    sep = bad.index(0x2C, 13 + 768)
    bad[sep] = 0x7E
    with _pytest.raises(ValueError, match="unexpected GIF block"):
        gif_frames(bytes(bad))
    with _pytest.raises(ValueError, match="no frames"):
        gif_encode_animated([])


# ------------- encoder upgrade pins (stereo assignments + LPC)


def _first_assignment(payload):
    # frame starts at byte 42; channel assignment = bits 24-27 of the
    # frame header = high nibble of its 4th byte
    return payload[42 + 3] >> 4


def test_stereo_encoder_roundtrip_and_assignment_choice():
    import math
    import random

    random.seed(11)
    # correlated channels -> a side-coded assignment wins
    L = [int(9000 * math.sin(i / 7.0)) for i in range(3000)]
    R = [v + random.randint(-40, 40) for v in L]
    pcm = struct.pack(f"<{2 * len(L)}h", *[s for p in zip(L, R) for s in p])
    enc = flac_encode(pcm, nchannels=2)
    chans, rate, bps = flac_decode(enc)
    assert chans == [L, R] and rate == 8000 and bps == 16
    assert _first_assignment(enc) in (8, 9, 10)
    ind = flac_encode(pcm, nchannels=2, use_lpc=False)
    assert len(enc) <= len(ind)
    # anti-correlated: mid is constant 0 or -1, side huge -> mid/side
    L2 = [v for v in L]
    R2 = [-v for v in L]
    pcm2 = struct.pack(
        f"<{2 * len(L2)}h", *[s for p in zip(L2, R2) for s in p]
    )
    enc2 = flac_encode(pcm2, nchannels=2)
    chans, _, _ = flac_decode(enc2)
    assert chans == [L2, R2]
    assert _first_assignment(enc2) == 10
    # independent noise channels -> independent assignment
    L3 = [random.randint(-30000, 30000) for _ in range(3000)]
    R3 = [random.randint(-30000, 30000) for _ in range(3000)]
    pcm3 = struct.pack(
        f"<{2 * len(L3)}h", *[s for p in zip(L3, R3) for s in p]
    )
    enc3 = flac_encode(pcm3, nchannels=2)
    chans, _, _ = flac_decode(enc3)
    assert chans == [L3, R3]
    assert _first_assignment(enc3) == 1
    # full-range side channel (needs the 17th bit)
    L4 = [32767, -32768] * 100
    R4 = [-32768, 32767] * 100
    pcm4 = struct.pack(
        f"<{2 * len(L4)}h", *[s for p in zip(L4, R4) for s in p]
    )
    chans, _, _ = flac_decode(flac_encode(pcm4, nchannels=2))
    assert chans == [L4, R4]


def test_lpc_encoder_beats_fixed_on_tonal_signal():
    import math

    x = [int(12000 * math.sin(i / 9.0)) for i in range(4500)]
    pcm = struct.pack(f"<{len(x)}h", *x)
    with_lpc = flac_encode(pcm, use_lpc=True)
    fixed_only = flac_encode(pcm, use_lpc=False)
    assert len(with_lpc) < len(fixed_only)
    for enc in (with_lpc, fixed_only):
        chans, _, _ = flac_decode(enc)
        assert chans[0] == x


def test_stereo_encoder_contract():
    with pytest.raises(NotImplementedError, match="mono or stereo"):
        flac_encode(b"\x00\x00" * 6, nchannels=3)
    with pytest.raises(ValueError, match="whole number of frames"):
        flac_encode(b"\x00\x00" * 3, nchannels=2)
