"""Real stdlib media decode (functions/multimodal.py): PNG inflate +
unfilter and WAV PCM, validated by forward-filter round-trips and
closed-form fixtures — no media libraries involved."""

import binascii
import struct
import zlib

import numpy as np
import pytest

from bzzz_spark.functions.multimodal import (
    PNG_MAGIC,
    _decode_payload,
    _png_decode,
    _png_parse,
    _wav_decode,
    attach_payload,
    decode_media,
    extract_features,
    synth_png,
    synth_wav,
)


def _chunk(t: bytes, d: bytes) -> bytes:
    return (
        struct.pack(">I", len(d)) + t + d
        + struct.pack(">I", binascii.crc32(t + d) & 0xFFFFFFFF)
    )


def _encode_png(px: np.ndarray, color_type: int, filt: int) -> bytes:
    """Forward-apply one PNG filter type per scanline and wrap in a
    valid file — decoding must invert it exactly."""
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int64)
    lines = []
    for y in range(h):
        cur = flat[y]
        prior = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        out = np.empty(stride, dtype=np.int64)
        for i in range(stride):
            left = cur[i - ch] if i >= ch else 0
            ul = prior[i - ch] if i >= ch else 0
            up = prior[i]
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = left
            elif filt == 2:
                pred = up
            elif filt == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (
                    up if pb <= pc else ul
                )
            out[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([filt]) + bytes(out.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
def test_png_unfilter_roundtrip(filt, color_type, ch):
    rng = np.random.RandomState(filt * 10 + color_type)
    px = rng.randint(0, 256, size=(5, 7, ch)).astype(np.uint8)
    data = _encode_png(px, color_type, filt)
    w, h, got_ch, flat = _png_parse(data)
    assert (w, h, got_ch) == (7, 5, ch)
    assert np.array_equal(flat, px.reshape(-1))


def test_png_palette():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = bytes([0, 1, 2, 1])
    raw = b"\x00" + idx  # one scanline, filter None
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 3, 0, 0, 0)
    data = (
        PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    d = _png_decode(data)
    assert d["channels"] == 3 and d["width"] == 4
    # mean over expanded RGB: each pixel contributes one 255 + two 0s
    assert abs(d["mean_val"] - 255.0 / 3.0) < 1e-12


def test_png_rejects_what_it_cannot_decode():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)  # 16-bit
    data = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth"):
        _png_decode(data)
    with pytest.raises(NotImplementedError, match="not PNG or WAV"):
        _decode_payload(b"\xff\xd8\xff\xe0 jpeg soi ...")


def test_wav_24bit_raises_cleanly_everywhere():
    """Both decode entry points agree on the failure mode for widths
    the decoders don't handle (24-bit PCM)."""
    import io
    import wave

    from bzzz_spark.functions.multimodal import _wav_byte_scale

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x01\x02" * 10)
    data = buf.getvalue()
    with pytest.raises(NotImplementedError, match="width 3"):
        _wav_decode(data)
    with pytest.raises(NotImplementedError, match="width 3"):
        _wav_byte_scale(data)


def test_wav_decode_closed_form():
    d = _wav_decode(synth_wav(250, 16000, -8192))
    assert d["sample_rate"] == 16000 and d["n_samples"] == 250
    assert d["channels"] == 1
    assert abs(d["rms"] - 8192 / 32768.0) < 1e-12
    assert abs(d["mean_val"] + 8192 / 32768.0) < 1e-12


def test_synth_png_closed_form():
    d = _png_decode(synth_png(9, 3, 200))
    assert d == {
        "fmt": "png", "width": 9, "height": 3, "channels": 1,
        "sample_rate": 0, "n_samples": 27, "mean_val": 200.0, "rms": 0.0,
    }


# ------------------------------------------------------------- Spark path


def test_decode_media_mixed_batch(spark):
    rows = [
        (1, synth_png(4, 2, 17)),
        (2, synth_wav(40, 8000, 99)),
        (3, synth_png(2, 2, 255)),
    ]
    media = spark.createDataFrame(
        [(i, "media", p, None) for i, p in rows],
        "media_id long, kind string, payload binary, meta string",
    )
    got = {r["media_id"]: r.asDict() for r in decode_media(media).collect()}
    assert got[1]["fmt"] == "png" and got[1]["width"] == 4
    assert got[1]["mean_val"] == 17.0
    assert got[2]["fmt"] == "wav" and got[2]["sample_rate"] == 8000
    assert abs(got[2]["rms"] - 99 / 32768.0) < 1e-12
    assert got[3]["mean_val"] == 255.0


def test_extract_features_real_decode(spark):
    media = spark.createDataFrame(
        [(1, "media", synth_png(8, 8, 64), None),
         (2, "media", synth_wav(64, 8000, 0), None)],
        "media_id long, kind string, payload binary, meta string",
    )
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, feat_dim=8, fake=False).collect()
    }
    # constant gray 64 → every decoded pixel lands in bucket 64 % 8 == 0
    assert feats[1][0] == 1.0 and sum(feats[1]) == 1.0
    # silent PCM maps to byte scale 128 → bucket 0
    assert feats[2][0] == 1.0


def test_extract_features_undecodable_raises_at_action(spark):
    docs = spark.createDataFrame(
        [(0, "just text, not a media payload")], "doc_id long, text string"
    )
    media = attach_payload(docs, "text", "doc_id")
    with pytest.raises(Exception, match="not PNG or WAV"):
        extract_features(media, fake=False).collect()
