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
