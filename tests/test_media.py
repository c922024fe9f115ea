"""Codec tests for operators/media.py — the from-scratch BMP/WAV/PPM parsers
behind the multimodal queries (round-5 replacement of the disclosed decode
stub). Round-trip byte-exactness plus the container quirks a lazy decoder
gets wrong: BMP row padding & bottom-up flip & BGR order, RIFF chunk walking
past extra chunks (incl. odd-size pad bytes), PPM header comments."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from minhash_spark.operators import media


@pytest.mark.parametrize("doc_id", [0, 1, 2, 16, 17, 123, 511, 12345])
def test_bmp_round_trip(doc_id):
    img = media.synth_image(doc_id)
    w, h, dec = media.decode_bmp(media.encode_bmp(img))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert np.array_equal(dec, img)


def test_bmp_padding_varies_across_fixture_widths():
    # the fixture width range must exercise every row-padding remainder,
    # otherwise the padding logic is never really tested
    pads = {(3 * media.image_dims(d)[0]) % 4 for d in range(40)}
    assert pads == {0, 1, 2, 3}


def test_bmp_bottom_up_and_bgr_are_not_identity():
    # an asymmetric image round-trips; the RAW payload differs from the
    # logical pixels (proving flip+BGR actually happen in the container)
    img = np.zeros((2, 3, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)  # top-left pure red
    blob = media.encode_bmp(img)
    _, _, dec = media.decode_bmp(blob)
    assert np.array_equal(dec, img)
    stride = (3 * 3 + 3) // 4 * 4
    # file's FIRST row is the image's BOTTOM row (all zeros), not the red one
    first_file_row = np.frombuffer(blob, np.uint8, count=stride, offset=54)
    assert first_file_row[:9].sum() == 0
    # red pixel sits in the SECOND file row, stored as B,G,R = 0,0,255
    second = np.frombuffer(blob, np.uint8, count=stride, offset=54 + stride)
    assert tuple(second[:3]) == (0, 0, 255)


@pytest.mark.parametrize("doc_id", [1, 3, 9, 127, 128, 255])
def test_wav_round_trip(doc_id):
    s = media.synth_audio(doc_id)
    rate, ch, dec = media.decode_wav(media.encode_wav_pcm16(s, media.AUDIO_RATE))
    assert rate == media.AUDIO_RATE and ch == 1
    assert np.array_equal(dec, s)


def test_wav_chunk_walk_skips_extra_chunks():
    """A real-world WAV can carry LIST/fact chunks between fmt and data; the
    decoder must walk chunks (honoring the odd-size pad byte), not assume
    data at offset 36."""
    s = media.synth_audio(7)
    raw = media.encode_wav_pcm16(s, 8000)
    fmt_chunk = raw[12 : 12 + 8 + 16]
    data_chunk = raw[12 + 8 + 16 :]
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    body = b"WAVE" + fmt_chunk + lst + data_chunk
    rate, ch, dec = media.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 8000 and np.array_equal(dec, s)


def test_wav_rejects_non_pcm16():
    s = media.synth_audio(1)
    raw = bytearray(media.encode_wav_pcm16(s, 8000))
    raw[20:22] = struct.pack("<H", 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="unsupported WAV format"):
        media.decode_wav(bytes(raw))


@pytest.mark.parametrize("doc_id", [0, 4, 8, 62, 63])
def test_ppm_stream_round_trip(doc_id):
    frames = media.synth_video(doc_id)
    blob = b"".join(media.encode_ppm(f) for f in frames)
    out = list(media.iter_ppm_frames(blob))
    assert len(out) == len(frames)
    for (w, h, dec), f in zip(out, frames):
        assert (w, h) == (f.shape[1], f.shape[0])
        assert np.array_equal(dec, f)


def test_ppm_header_comments_and_multidigit_dims():
    img = ((np.arange(120 * 35 * 3) * 7) % 256).astype(np.uint8).reshape(35, 120, 3)
    blob = b"P6\n# comment line\n120 35\n# another\n255\n" + img.tobytes()
    w, h, dec = next(media.iter_ppm_frames(blob))
    assert (w, h) == (120, 35)
    assert np.array_equal(dec, img)


def test_ppm_bad_magic_raises():
    with pytest.raises(ValueError, match="bad PPM magic"):
        next(media.iter_ppm_frames(b"P5\n1 1\n255\n\x00"))


def test_bmp_rejects_compressed():
    blob = bytearray(media.encode_bmp(media.synth_image(2)))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        media.decode_bmp(bytes(blob))


# ---------------------------------------------------------------------------
# dHash (X67 perceptual image near-dup)
# ---------------------------------------------------------------------------


def _dhash_brute(rgb):
    """Independent scalar re-implementation of media.dhash64 (double loop)."""
    h, w, _ = rgb.shape
    val = 0
    for y in range(8):
        for x in range(8):
            r = (y * h) // 8
            c1 = (x * w) // 9
            c2 = ((x + 1) * w) // 9

            def luma(rr, cc):
                px = rgb[rr, cc].astype(np.int64)
                return (int(px[0]) + 2 * int(px[1]) + int(px[2])) // 4

            if luma(r, c2) > luma(r, c1):
                val |= 1 << (y * 8 + x)
    return val - (1 << 64) if val >= (1 << 63) else val


@pytest.mark.parametrize("doc_id", [0, 1, 22, 23, 97, 511, 4099])
def test_dhash64_matches_scalar_reference(doc_id):
    img = media.synth_phash_image(doc_id)
    assert media.dhash64(img) == _dhash_brute(img)


def test_dhash64_signed_two_complement_hex_round_trip():
    # an all-bright-right gradient sets the top bit -> negative signed long;
    # the unsigned hex rendering must round-trip the same 64 bits
    img = np.zeros((8, 9, 3), dtype=np.uint8)
    img[:, :, :] = (np.arange(9, dtype=np.uint8) * 20)[None, :, None]
    v = media.dhash64(img)
    assert v == -1  # every comparison right > left -> all 64 bits set
    assert f"{v & ((1 << 64) - 1):016x}" == "f" * 16


def test_dhash64_same_group_docs_collide_or_nearly():
    """Planted structure: unperturbed same-group docs would hash equal; the
    sparse perturbation keeps intra-group hamming small (<= 2 flips per
    sampled hit), while cross-group hashes are far apart on average."""
    G = media.PHASH_GROUPS

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    intra = [
        ham(media.dhash64(media.synth_phash_image(d)),
            media.dhash64(media.synth_phash_image(d + 5 * G)))
        for d in range(G)
    ]
    cross = [
        ham(media.dhash64(media.synth_phash_image(g)),
            media.dhash64(media.synth_phash_image(g + 1)))
        for g in range(G - 1)
    ]
    assert max(intra) <= 4  # <=2 sampled perturbation hits x <=2 flips each
    assert sum(cross) / len(cross) > 10  # different gradients differ widely


def test_dhash_pigeonhole_band_guarantee():
    """The band join's recall proof: ANY pair within hamming <= 3 shares at
    least one unchanged 16-bit band. Exhaustive over all 1-3 bit flips of a
    fixed hash restricted to representative positions per band."""
    base = media.dhash64(media.synth_phash_image(7)) & ((1 << 64) - 1)

    def bands(v):
        return [(v >> (16 * i)) & 0xFFFF for i in range(4)]

    import itertools

    positions = [0, 15, 16, 31, 32, 47, 48, 63]
    for k in (1, 2, 3):
        for flips in itertools.combinations(positions, k):
            other = base
            for p in flips:
                other ^= 1 << p
            shared = [i for i in range(4) if bands(base)[i] == bands(other)[i]]
            assert shared, f"no shared band for flips {flips}"


# ---------------------------------------------------------------------------
# Audio energy-envelope fingerprint (X71)
# ---------------------------------------------------------------------------


def _afp_brute(samples):
    """Independent scalar re-implementation of media.afp64."""
    n = len(samples)
    e = [0] * media.AFP_WINDOWS
    for t in range(n):
        e[(t * media.AFP_WINDOWS) // n] += abs(int(samples[t]))
    val = 0
    for i in range(64):
        if e[i + 1] > e[i]:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


@pytest.mark.parametrize("doc_id", [0, 1, 18, 19, 97, 511, 4099])
def test_afp64_matches_scalar_reference(doc_id):
    s = media.synth_afp_audio(doc_id)
    assert media.afp64(s) == _afp_brute(s)


def test_afp64_survives_wav_round_trip(doc_id=137):
    s = media.synth_afp_audio(doc_id)
    blob = media.encode_wav_pcm16(s, media.AUDIO_RATE)
    _rate, _ch, dec = media.decode_wav(blob)
    assert media.afp64(dec) == media.afp64(s)


def test_afp_same_group_docs_near_cross_group_far():
    G = media.AFP_GROUPS

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    intra = [
        ham(media.afp64(media.synth_afp_audio(d)),
            media.afp64(media.synth_afp_audio(d + 7 * G)))
        for d in range(G)
    ]
    cross = [
        ham(media.afp64(media.synth_afp_audio(g)),
            media.afp64(media.synth_afp_audio(g + 1)))
        for g in range(G - 1)
    ]
    # one spike moves one window's energy: <= 2 difference bits flip per doc
    assert max(intra) <= 4
    assert sum(cross) / len(cross) > 10


def test_hamming_neighbor_stats_degenerate_corpus_stays_linear(spark):
    """Scale claim of the distinct-hash collapse: a corpus where EVERY doc
    has the same perceptual hash (the billion-copies-of-one-meme case) must
    produce zero band-join pair rows — neighbor counts come from the hash
    multiplicity alone, never from a doc-level pair table."""
    from pyspark.sql import functions as F

    from minhash_spark.operators import perceptual

    n = 1000
    hashes = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0x1234).cast("long").alias("phash")
    )
    out = perceptual.hamming_neighbor_stats(hashes, 3)
    rows = out.collect()
    assert len(rows) == n
    assert all(r["n_near"] == n - 1 and r["min_ham"] == 0 for r in rows)


# ---------------------------------------------------------------------------
# Video keyframe fingerprint (X73)
# ---------------------------------------------------------------------------


def test_vfp_keyframe_hash_survives_ppm_stream_round_trip():
    for doc_id in (0, 1, 17, 137, 499):
        frames = media.synth_vfp_video(doc_id)
        blob = b"".join(media.encode_ppm(fr) for fr in frames)
        decoded = [rgb for _w, _h, rgb in media.iter_ppm_frames(blob)]
        assert len(decoded) == len(frames)
        for a, b in zip(frames, decoded):
            assert np.array_equal(a, b)
        assert media.dhash64(decoded[len(decoded) // 2]) == media.dhash64(
            frames[len(frames) // 2]
        )


def test_vfp_same_group_near_cross_group_far():
    G = media.VFP_GROUPS

    def key_hash(d):
        frames = media.synth_vfp_video(d)
        return media.dhash64(frames[len(frames) // 2])

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    intra = [ham(key_hash(d), key_hash(d + 3 * G)) for d in range(G)]
    cross = [ham(key_hash(g), key_hash(g + 1)) for g in range(G - 1)]
    assert max(intra) <= 4  # sparse keyframe perturbation only
    assert sum(cross) / len(cross) > 10


def test_vfp_perturbation_hits_only_the_keyframe():
    d = 42
    g = d % media.VFP_GROUPS
    n_frames, w, h = media.vfp_dims(g)
    kf = n_frames // 2
    base_d = d + 5 * media.VFP_GROUPS  # same group, different perturbation
    a, b = media.synth_vfp_video(d), media.synth_vfp_video(base_d)
    for f in range(n_frames):
        if f == kf:
            continue
        assert np.array_equal(a[f], b[f])  # non-keyframes are group-identical
