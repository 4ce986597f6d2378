"""Round-12 fragmented-MP4 (ISO BMFF §8.8) codec pins: the
writer/reader round trip, addressing modes the writer does NOT emit
(explicit base-data-offset, tfhd/trex default sample sizes, multiple
truns per traf), and the malformed/unsupported error contract.
Public spec: ISO/IEC 14496-12 (movie fragments §8.8)."""

import struct

import pytest

from faconne_spark.operators.multimodal import (
    jpeg_encode,
    jpeg_pixels,
    mp4_encode_mjpeg_fragmented,
    mp4_frames,
    mp4_sample_table,
    sample_frames_real,
)

ONES = ([1] * 64, [1] * 64)


def _jpeg(v, w=8, h=8):
    return jpeg_encode(w, h, bytes([v]) * (w * h), channels=1, quant=ONES)


def _full(fourcc, version, flags, content):
    return (
        struct.pack(">I", 12 + len(content))
        + fourcc
        + struct.pack(">I", (version << 24) | flags)
        + content
    )


def _box(fourcc, content):
    return struct.pack(">I", 8 + len(content)) + fourcc + content


def test_fragmented_roundtrip_bitexact():
    frames = [_jpeg(v) for v in (9, 77, 200, 31, 55)]
    mp4 = mp4_encode_mjpeg_fragmented(frames, 8, 8, frames_per_fragment=2)
    t = mp4_sample_table(mp4)
    assert t["codec"] == "jpeg"
    assert (t["width"], t["height"], t["timescale"]) == (8, 8, 1000)
    assert mp4_frames(mp4) == frames
    kept = sample_frames_real(mp4, 2)
    assert [i for i, _ in kept] == [0, 2, 4]
    for _i, f in kept:
        assert jpeg_pixels(f)[:3] == (8, 8, 1)


@pytest.mark.parametrize("fpf", [1, 3, 99])
def test_fragment_size_sweep(fpf):
    """One sample per fragment, ragged tail, and everything-in-one —
    the fragment boundary must never shift a sample."""
    frames = [_jpeg(v) for v in range(7)]
    mp4 = mp4_encode_mjpeg_fragmented(frames, 8, 8, frames_per_fragment=fpf)
    assert mp4_frames(mp4) == frames


def _frag_mp4(sample_bytes, sizes, tfhd_flags, trun_flags,
              tfhd_extra=b"", trex_default_size=0, trun_sizes=None,
              data_offset=None, two_truns=False):
    """Hand-built minimal fragmented MP4: ftyp + moov(empty stbl +
    mvex/trex) + one moof + mdat — exercises reader paths the writer
    never produces."""
    ftyp = _box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"iso5")
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1) + struct.pack(">HH", 0, 0)
        + b"\x00" * 12 + struct.pack(">HH", 4, 4)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stbl = _box(
        b"stbl",
        stsd
        + _full(b"stts", 0, 0, struct.pack(">I", 0))
        + _full(b"stsc", 0, 0, struct.pack(">I", 0))
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, 0, struct.pack(">I", 0)),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"h\x00",
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, 90000, 0) + struct.pack(">HH", 0, 0),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, 0) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + b"\x00" * 36
        + struct.pack(">II", 4 << 16, 4 << 16),
    )
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
    trak = _box(b"trak", tkhd + mdia)
    trex = _full(
        b"trex", 0, 0, struct.pack(">5I", 1, 1, 1, trex_default_size, 0)
    )
    moov = _box(b"moov", _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 90000, 0)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0) + b"\x00" * 8
        + b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2),
    ) + trak + _box(b"mvex", trex))

    def trun_payload(n, ts, off):
        body = struct.pack(">I", n)
        if trun_flags & 0x1:
            body += struct.pack(">i", off)
        if trun_flags & 0x200:
            body += b"".join(struct.pack(">I", s) for s in ts)
        return body

    mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", 1))
    tfhd = _full(b"tfhd", 0, tfhd_flags, struct.pack(">I", 1) + tfhd_extra)
    # sample COUNT always comes from `sizes` (the logical samples);
    # per-sample size ENTRIES only when the 0x200 flag carries them
    ts = trun_sizes if trun_sizes is not None else sizes
    if two_truns:
        half = len(sizes) // 2
        off2 = (data_offset or 0) + sum(sizes[:half])
        truns = (
            _full(b"trun", 0, trun_flags, trun_payload(half, ts[:half],
                                                       data_offset or 0))
            + _full(b"trun", 0, trun_flags, trun_payload(
                len(sizes) - half, ts[half:], off2))
        )
    else:
        truns = _full(
            b"trun", 0, trun_flags,
            trun_payload(len(sizes), ts, data_offset or 0),
        )
    traf = _box(b"traf", tfhd + truns)
    moof = _box(b"moof", mfhd + traf)
    mdat = _box(b"mdat", sample_bytes)
    return ftyp, moov, moof, mdat


def test_explicit_base_data_offset():
    """tfhd with base-data-offset (no default-base-is-moof): samples
    address from an absolute file offset, not the moof start."""
    data = b"AABBCC"
    ftyp, moov, moof, mdat = _frag_mp4(
        data, sizes=[2, 2, 2], tfhd_flags=0x000001, trun_flags=0x201,
        tfhd_extra=b"\x00" * 8,
    )
    # absolute offset of the mdat payload
    base = len(ftyp) + len(moov) + len(moof) + 8
    ftyp2, moov2, moof2, mdat2 = _frag_mp4(
        data, sizes=[2, 2, 2], tfhd_flags=0x000001, trun_flags=0x201,
        tfhd_extra=struct.pack(">Q", base),
    )
    payload = ftyp2 + moov2 + moof2 + mdat2
    t = mp4_sample_table(payload)
    assert [payload[o:o + s] for o, s in t["samples"]] == [
        b"AA", b"BB", b"CC"
    ]


def test_tfhd_default_sample_size():
    """No per-sample sizes in trun: the tfhd default carries them."""
    data = b"AABBCC"
    ftyp, moov, moof, mdat = _frag_mp4(
        data, sizes=[2, 2, 2], tfhd_flags=0x020010, trun_flags=0x001,
        tfhd_extra=struct.pack(">I", 2), trun_sizes=[],
    )
    payload = ftyp + moov + moof + mdat
    # default-base-is-moof: data_offset = moof size + mdat header
    payload = _patch_offset(payload, moof, len(moof) + 8)
    t = mp4_sample_table(payload)
    assert [payload[o:o + s] for o, s in t["samples"]] == [
        b"AA", b"BB", b"CC"
    ]


def test_trex_default_sample_size():
    """No trun sizes, no tfhd default: trex default applies."""
    data = b"ABCD"
    ftyp, moov, moof, mdat = _frag_mp4(
        data, sizes=[2, 2], tfhd_flags=0x020000, trun_flags=0x001,
        trex_default_size=2, trun_sizes=[],
    )
    payload = ftyp + moov + moof + mdat
    payload = _patch_offset(payload, moof, len(moof) + 8)
    t = mp4_sample_table(payload)
    assert [payload[o:o + s] for o, s in t["samples"]] == [b"AB", b"CD"]


def test_two_truns_one_traf():
    data = b"AABBCCDD"
    ftyp, moov, moof, mdat = _frag_mp4(
        data, sizes=[2, 2, 2, 2], tfhd_flags=0x020000, trun_flags=0x201,
        two_truns=True,
    )
    payload = ftyp + moov + moof + mdat
    # patch both trun offsets relative to moof start
    base = len(moof) + 8
    payload = _patch_offsets_two(payload, moof, base, base + 4)
    t = mp4_sample_table(payload)
    assert [payload[o:o + s] for o, s in t["samples"]] == [
        b"AA", b"BB", b"CC", b"DD"
    ]


def test_no_data_offset_raises():
    data = b"AABB"
    ftyp, moov, moof, mdat = _frag_mp4(
        data, sizes=[2, 2], tfhd_flags=0x020000, trun_flags=0x200,
    )
    with pytest.raises(ValueError, match="without data_offset"):
        mp4_sample_table(ftyp + moov + moof + mdat)


def test_no_resolvable_size_raises():
    data = b"AABB"
    ftyp, moov, moof, mdat = _frag_mp4(
        data, sizes=[2, 2], tfhd_flags=0x020000, trun_flags=0x001,
        trun_sizes=[],
    )
    payload = ftyp + moov + moof + mdat
    payload = _patch_offset(payload, moof, len(moof) + 8)
    with pytest.raises(ValueError, match="no size"):
        mp4_sample_table(payload)


def test_sample_overrun_raises():
    data = b"AA"
    ftyp, moov, moof, mdat = _frag_mp4(
        data, sizes=[2, 10 ** 6], tfhd_flags=0x020000, trun_flags=0x201,
    )
    payload = ftyp + moov + moof + mdat
    payload = _patch_offset(payload, moof, len(moof) + 8)
    with pytest.raises(ValueError, match="overruns the file"):
        mp4_sample_table(payload)


def test_mixed_stbl_and_moof_raises():
    """An unfragmented table AND fragments: refused loudly."""
    from faconne_spark.operators.multimodal import mp4_encode_mjpeg

    frames = [_jpeg(v) for v in (1, 2)]
    plain = mp4_encode_mjpeg(frames, 8, 8)
    # graft a moof box onto the end (content irrelevant: detection
    # happens before the fragment walk)
    grafted = plain + _box(b"moof", _full(
        b"mfhd", 0, 0, struct.pack(">I", 1)
    ))
    with pytest.raises(NotImplementedError, match="BOTH stbl samples"):
        mp4_sample_table(grafted)


def _patch_offset(payload, moof, data_offset):
    """Rewrite the single trun's data_offset in the already-assembled
    payload (the hand-builder writes 0)."""
    i = payload.index(b"trun")
    # fourcc + verflags(4) + sample_count(4) -> offset field
    at = i + 4 + 4 + 4
    return payload[:at] + struct.pack(">i", data_offset) + payload[at + 4:]


def _patch_offsets_two(payload, moof, off1, off2):
    i1 = payload.index(b"trun")
    at1 = i1 + 12
    payload = (
        payload[:at1] + struct.pack(">i", off1) + payload[at1 + 4:]
    )
    i2 = payload.index(b"trun", i1 + 4)
    at2 = i2 + 12
    return payload[:at2] + struct.pack(">i", off2) + payload[at2 + 4:]


def test_fragmented_synthesize_and_extract_batch(spark):
    """The full engine seam at a tiny scale: synthesize fragmented →
    §8.8 walk → JPEG decode → stats, against a Python replay."""
    import hashlib

    from faconne_spark.operators.multimodal import (
        extract_mp4_frame_stats,
        synthesize_mp4_fragmented,
    )

    docs = spark.createDataFrame(
        [(i, f"frag doc {i} text") for i in range(6)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in extract_mp4_frame_stats(
            synthesize_mp4_fragmented(docs)
        ).collect()
    }
    for i in range(6):
        d = hashlib.md5(f"frag doc {i} text".encode()).digest()
        n = 2 + d[7] % 6
        wb, hb = 1 + d[8] % 3, 1 + d[9] % 3
        expect = 0
        for fi in range(0, n, 2):
            expect += 64 * sum(
                d[(k + fi) % 16] for k in range(wb * hb)
            )
        r = got[i]
        assert (r["width"], r["height"]) == (8 * wb, 8 * hb)
        assert r["n_frames_kept"] == (n + 1) // 2
        assert r["pixel_sum"] == expect
