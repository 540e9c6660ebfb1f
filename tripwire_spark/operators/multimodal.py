"""Multimodal columns: images/audio/video as opaque ``binary`` with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is REAL and tested: schemas, partitioning,
UDF signatures, batch shapes, and the deterministic fake feature
extractor.  Decode is REAL for the container-decodable formats —
24-bit uncompressed BMP (struct + numpy), 8-bit non-interlaced PNG
(stdlib ``zlib`` + numpy unfiltering, all five RFC 2083 scanline
filters), and 16-bit PCM WAV (stdlib ``wave``) round-trip byte-exactly,
and ``extract_media_stats`` / ``resize_thumbnails`` /
``perceptual_hash`` run real pixel/sample math over them.  The
remaining compressed codecs (JPEG/MP3/H.264) need Pillow/librosa/
ffmpeg, which are NOT in this container, so ``_decode_image_real``
raises ``NotImplementedError`` for those magics — swap that one branch
when the libs exist; nothing else changes.

Pattern notes for 100 TB media tables:
- media stays in its own table keyed by content hash; pipelines join
  metadata first and only ship bytes into the UDF stage that needs
  them (column pruning keeps the scan light),
- ``mapInPandas`` (iterator form) processes one Arrow batch at a time,
  so peak memory is one batch of blobs per task, not one partition,
- ``spark.sql.files.maxPartitionBytes`` (or a repartition on the hash)
  bounds blob bytes per task.
"""

from __future__ import annotations

import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"
THUMB_SCHEMA = "media_id long, thumb binary, thumb_w int, thumb_h int"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int"


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media blobs (content = seeded bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("content"),
        (F.lit(64) + F.pmod("id", F.lit(64))).cast("int").alias("width"),
        (F.lit(48) + F.pmod("id", F.lit(48))).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.lit(1000) + (F.col("id") * 37)).cast("int").alias("duration_ms"),
    )


# --- real codecs for container-decodable formats ---------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) -> 24-bit uncompressed BMP bytes (BI_RGB,
    bottom-up rows, 4-byte row padding) — the on-disk format per the
    public BITMAPFILEHEADER/BITMAPINFOHEADER layout."""
    import struct

    h, w, _ = arr.shape
    pad = (-3 * w) % 4
    img_size = (3 * w + pad) * h
    head = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    bgr = arr[:, :, ::-1]  # BMP stores BGR
    for r in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[r].tobytes() + b"\x00" * pad
    return head + info + bytes(rows)


def decode_bmp(content: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> HxWx3 uint8 (RGB)."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", content, 10)
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", content, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    pad = (-3 * w) % 4
    stride = 3 * w + pad
    flip = h > 0
    h = abs(h)
    raw = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """HxWxC uint8 (C=1 gray, 3 RGB, 4 RGBA) -> 8-bit non-interlaced
    PNG bytes (stdlib ``zlib``; public RFC 2083 wire format).

    ``filter_type`` applies the same scanline filter (0..4) to every
    row — a real encoder picks per-row, but emitting each filter on
    demand lets the decode tests pin every unfilter branch."""
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    a = arr.astype(np.int64)
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int64)
    for r in range(h):
        cur = a[r]
        left = np.vstack([np.zeros((1, ch), dtype=np.int64), cur[:-1]])
        upleft = np.vstack([np.zeros((1, ch), dtype=np.int64), prev[:-1]])
        if filter_type == 0:
            line = cur
        elif filter_type == 1:  # Sub
            line = cur - left
        elif filter_type == 2:  # Up
            line = cur - prev
        elif filter_type == 3:  # Average
            line = cur - ((left + prev) >> 1)
        elif filter_type == 4:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            line = cur - pred
        else:
            raise ValueError(f"bad filter {filter_type}")
        raw.append(filter_type)
        raw += (line & 0xFF).astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> np.ndarray:
    """8-bit non-interlaced gray/RGB/RGBA PNG bytes -> HxWxC uint8.

    Pure stdlib ``zlib`` inflate + numpy per-scanline unfiltering (all
    five RFC 2083 filters; Sub is a grouped cumsum, Up a vector add,
    Average/Paeth walk pixels with vectorized channels).  Palette,
    16-bit, and interlaced variants raise ``NotImplementedError`` —
    same opaque-fallback posture as every other codec gap here."""
    import zlib

    if content[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(content):
        (ln,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in (0, 2, 6) or comp or filt or interlace:
        raise NotImplementedError(
            f"PNG depth={depth} color={ctype} interlace={interlace} unsupported"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    try:
        data = zlib.decompress(bytes(idat))
    except zlib.error as e:  # truncated/corrupt stream -> uniform refusal
        raise ValueError(f"corrupt PNG stream: {e}") from None
    if len(data) < h * (1 + stride):
        raise ValueError("truncated PNG pixel data")
    lines = np.frombuffer(data, np.uint8, count=h * (1 + stride)).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft = int(lines[r, 0])
        line = lines[r, 1:].astype(np.int64)
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: recon[x] = line[x] + recon[x-ch] == per-channel cumsum
            rec = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride)
        elif ft == 2:  # Up
            rec = line + prev
        elif ft in (3, 4):  # Average / Paeth: left-neighbor dependent
            rec = np.zeros(stride, dtype=np.int64)
            lv = line.reshape(w, ch)
            pv = prev.reshape(w, ch)
            rv = rec.reshape(w, ch)
            a = np.zeros(ch, dtype=np.int64)  # reconstructed left pixel
            for x in range(w):
                b = pv[x]
                if ft == 3:
                    rv[x] = (lv[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = pv[x - 1] if x else np.zeros(ch, dtype=np.int64)
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                    rv[x] = (lv[x] + pred) & 0xFF
                a = rv[x]
        else:
            raise ValueError(f"bad PNG filter {ft}")
        rec &= 0xFF
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, ch)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> PCM WAV bytes (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (int16 mono samples, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise NotImplementedError("only 16-bit mono PCM supported")
        return (
            np.frombuffer(f.readframes(f.getnframes()), dtype="<i2"),
            f.getframerate(),
        )


def _decode_image_real(content: bytes) -> np.ndarray:
    """Decode an image blob to HxWx3 RGB.  BMP (pure struct+numpy),
    8-bit non-interlaced PNG (stdlib zlib + numpy unfiltering), and
    baseline JPEG (functions/jpeg.py: huffman + dequant + vectorized
    IDCT, 4:4:4/4:2:2/4:2:0/gray, restart markers) decode here;
    progressive JPEG / the remaining codecs raise, and a deployment
    with Pillow swaps in the real call in this one branch."""
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:8] == PNG_MAGIC:
        arr = decode_png(content)
        if arr.shape[2] == 1:  # gray -> RGB
            return np.repeat(arr, 3, axis=2)
        return arr[:, :, :3].copy() if arr.shape[2] == 4 else arr  # drop alpha
    if content[:2] == b"\xff\xd8":
        from tripwire_spark.functions.jpeg import decode_jpeg

        arr = decode_jpeg(content)
        return np.repeat(arr, 3, axis=2) if arr.shape[2] == 1 else arr
    raise NotImplementedError("compressed image codec not available in this container")


MEDIA_STATS_SCHEMA = (
    "media_id long, kind string, fmt string, width int, height int, "
    "n_samples long, sample_rate int, mean_lum double, rms double"
)


def synth_media_real(spark: SparkSession, n: int = 24) -> DataFrame:
    """Deterministic REAL media blobs: even ids carry gradient images —
    cycling 24-bit BMP (i%6==0), 8-bit PNG (i%6==2, RGBA every other
    one, scanline filter cycling 0..4), and baseline JPEG (i%6==4,
    alternating 4:4:4 / 4:2:0 with restart markers) — odd ids carry
    16-bit PCM WAV integer ramps; all decodable by this module's own
    pure-numpy/stdlib codecs.  A driver-side fixture builder (like
    ``warc.write_warc``): fixtures are small; production media arrives
    in its own table."""
    from tripwire_spark.functions.jpeg import encode_jpeg

    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + (i % 5), 6 + (i % 4)
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack(
                [
                    (xx * 31 + i) % 256,
                    (yy * 17 + 2 * i) % 256,
                    ((xx + yy) * 7 + 3 * i) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            if i % 6 == 2:
                if i % 12 == 8:  # RGBA variant (alpha ramp; decode drops it)
                    alpha = ((xx * 11 + i) % 256).astype(np.uint8)[:, :, None]
                    arr4 = np.concatenate([arr, alpha], axis=2)
                    blob = encode_png(arr4, filter_type=(i // 2) % 5)
                else:
                    blob = encode_png(arr, filter_type=(i // 2) % 5)
            elif i % 6 == 4:
                blob = encode_jpeg(
                    arr, quality=90, subsample=(i % 12 == 10),
                    restart_interval=2 if i % 12 == 10 else 0,
                )
            else:
                blob = encode_bmp(arr)
            rows.append((i, "image", bytearray(blob), w, h, None, None))
        else:
            ns = 1600 + 10 * i
            t = np.arange(ns)
            samples = ((t * 13 * (i + 1)) % 4001 - 2000).astype(np.int16)
            rows.append(
                (i, "audio", bytearray(encode_wav(samples, 16000)), None, None,
                 16000, ns * 1000 // 16000)
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_media_stats(media: DataFrame) -> DataFrame:
    """REAL decoded statistics per blob: BMP -> (width, height, mean
    luminance), WAV -> (n_samples, sample_rate, RMS); anything this
    container cannot decode comes back fmt='opaque' with null stats
    instead of failing the batch.  Iterator-form mapInPandas: one Arrow
    batch of blobs in memory per task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "kind", "fmt", "width", "height",
                "n_samples", "sample_rate", "mean_lum", "rms")
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for mid, kind, c in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                cb = bytes(c) if c is not None else b""
                fmt, w, h, ns, sr, lum, rms = "opaque", None, None, None, None, None, None
                try:
                    if cb[:2] == b"BM":
                        arr = decode_bmp(cb)
                        fmt, h, w = "bmp", arr.shape[0], arr.shape[1]
                        lum = round(float(arr.mean()) / 255.0, 6)
                    elif cb[:8] == PNG_MAGIC:
                        arr = _decode_image_real(cb)  # RGB view (alpha dropped)
                        fmt, h, w = "png", arr.shape[0], arr.shape[1]
                        lum = round(float(arr.mean()) / 255.0, 6)
                    elif cb[:2] == b"\xff\xd8":
                        arr = _decode_image_real(cb)  # baseline JPEG
                        fmt, h, w = "jpeg", arr.shape[0], arr.shape[1]
                        lum = round(float(arr.mean()) / 255.0, 6)
                    elif cb[:4] == b"RIFF":
                        s, sr = decode_wav(cb)
                        fmt, ns = "wav", len(s)
                        rms = round(float(np.sqrt(np.mean((s / 32768.0) ** 2))), 6)
                except (NotImplementedError, wave.Error, EOFError, ValueError,
                        struct.error, IndexError):
                    # corrupt/truncated blob behind a valid magic: still
                    # an 'opaque' row, never a dead task
                    fmt, w, h, ns, sr, lum, rms = "opaque", None, None, None, None, None, None
                for k, v in zip(cols, (mid, kind, fmt, w, h, ns, sr, lum, rms)):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, MEDIA_STATS_SCHEMA)


def _fake_feature(content: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector."""
    b = np.frombuffer(content or b"\x00", dtype=np.uint8)
    acc = np.array([b[i::dim].sum() % 997 for i in range(dim)], dtype=np.float32)
    return acc / 997.0


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Batch-shaped feature extraction over binary content."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(c, dim).tolist() if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_thumbnails(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Aspect-preserving thumbnails.  BMP blobs get a REAL resize
    (nearest-neighbor index grid over the decoded array, re-encoded as
    BMP); blobs this container cannot decode fall back to the
    deterministic fake bytes so the pipeline never dies on a codec gap.

    Dimension math is vectorized numpy over the whole Arrow batch; the
    per-blob python is the decode/encode a real codec needs anyway."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].to_numpy(dtype=np.float64)
            h = pdf["height"].to_numpy(dtype=np.float64)
            scale = max_side / np.maximum(w, h)
            tw = np.maximum(1, (w * scale).astype(np.int64))
            th = np.maximum(1, (h * scale).astype(np.int64))
            thumbs = []
            for c, tw_i, th_i in zip(pdf["content"], tw, th):
                cb = bytes(c) if c is not None else b""
                if cb[:2] == b"BM" or cb[:8] == PNG_MAGIC or cb[:2] == b"\xff\xd8":
                    try:
                        # thumbs normalize to one container (BMP) so
                        # downstream consumers decode uniformly
                        arr = _decode_image_real(cb)
                        ridx = (np.arange(th_i) * arr.shape[0] / th_i).astype(np.int64)
                        cidx = (np.arange(tw_i) * arr.shape[1] / tw_i).astype(np.int64)
                        thumbs.append(encode_bmp(arr[ridx][:, cidx]))
                        continue
                    except (NotImplementedError, ValueError, struct.error, IndexError):
                        pass  # corrupt blob -> deterministic fake thumb below
                thumbs.append((_fake_feature(cb, 4) * 255).astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "thumb_w": tw.astype("int32"),
                    "thumb_h": th.astype("int32"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=THUMB_SCHEMA)


PHASH_SCHEMA = "media_id long, ahash long"


def _pack_bits(bits: np.ndarray) -> int:
    """Pack <=64 booleans into a signed int64 (bit i = bits[i])."""
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def _ahash_bits(arr: np.ndarray, side: int = 8) -> int:
    """Average-hash: grayscale -> side x side block means -> bit i set
    where block i's mean exceeds the global block mean.  Exact-integer
    -free but deterministic: reduceat block sums over float64 with a
    fixed traversal order.  Images smaller than the grid on either axis
    fall back to nearest-neighbor SAMPLING of the same grid (block
    boundaries would repeat and divide by zero-sized blocks)."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    if h == 0 or w == 0:
        return 0
    ri = (np.arange(side) * h) // side
    ci = (np.arange(side) * w) // side
    if h < side or w < side:
        means = gray[ri][:, ci]
    else:
        blocks = np.add.reduceat(np.add.reduceat(gray, ri, axis=0), ci, axis=1)
        rs = np.diff(np.append(ri, h)).astype(np.float64)
        cs = np.diff(np.append(ci, w)).astype(np.float64)
        means = blocks / np.outer(rs, cs)
    return _pack_bits((means > means.mean()).flatten())


def _fingerprint_runner(magics, hash_one):
    """Shared mapInPandas body for the media fingerprints: keep rows
    whose content starts with one of ``magics`` AND decodes, hash via
    ``hash_one(content_bytes) -> int`` (returns None to drop), emit
    (media_id, ahash).  A corrupt or unsupported blob is DROPPED, never
    fatal: at 100 TB one truncated file must not kill the job."""
    if isinstance(magics, bytes):
        magics = (magics,)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                cb = bytes(c) if c is not None else b""
                if not any(cb[: len(m)] == m for m in magics):
                    continue
                hv = hash_one(cb)
                if hv is None:
                    continue
                ids.append(mid)
                hashes.append(hv)
            yield pd.DataFrame({"media_id": ids, "ahash": hashes}).astype(
                {"media_id": "int64", "ahash": "int64"}
            )

    return run


def perceptual_hash(media: DataFrame, side: int = 8) -> DataFrame:
    """64-bit average-hash per decodable image (media_id, ahash).

    Blobs the container cannot decode — wrong codec, truncated header,
    corrupt pixel data — are DROPPED (a near-dup verdict over fake
    bytes would be noise, unlike the stats/thumbnail paths where an
    opaque row is still useful).  Iterator-form mapInPandas, one Arrow
    batch of blobs in memory per task; at 100 TB the hash is computed
    next to the bytes and only 16 bytes/row leave the scan."""

    def hash_one(cb: bytes) -> int | None:
        try:
            return _ahash_bits(_decode_image_real(cb), side)
        except (NotImplementedError, ValueError, struct.error, IndexError):
            return None

    return media.filter(F.col("kind") == "image").mapInPandas(
        _fingerprint_runner((b"BM", PNG_MAGIC, b"\xff\xd8"), hash_one),
        schema=PHASH_SCHEMA,
    )


def _audio_fingerprint_bits(samples: np.ndarray, n_windows: int = 64) -> int:
    """Energy-envelope fingerprint: bit i set where window i's RMS
    energy exceeds the median window energy.  Loudness-scale invariant
    (a constant gain moves every window and the median together).
    Clips shorter than ``n_windows`` samples fall back to per-sample
    energies over a nearest-neighbor window grid (zero-length windows
    would divide by zero)."""
    s = samples.astype(np.float64)
    n = len(s)
    if n == 0:
        return 0
    wi = (np.arange(n_windows) * n) // n_windows
    if n < n_windows:
        rms = np.abs(s[wi])
    else:
        sums = np.add.reduceat(s * s, wi)
        lens = np.diff(np.append(wi, n)).astype(np.float64)
        rms = np.sqrt(sums / lens)
    return _pack_bits(rms > np.median(rms))


def audio_fingerprint(media: DataFrame, n_windows: int = 64) -> DataFrame:
    """64-bit energy-envelope fingerprint per decodable WAV
    (media_id, ahash) — the audio twin of :func:`perceptual_hash`,
    sharing its schema so the same hamming join finds near-dup audio.
    RIFF blobs that are not decodable 16-bit mono PCM (AVI/WebP share
    the magic; truncated files) are dropped, never fatal."""

    def hash_one(cb: bytes) -> int | None:
        try:
            s, _sr = decode_wav(cb)
        except (NotImplementedError, wave.Error, EOFError, ValueError, struct.error):
            return None
        return _audio_fingerprint_bits(s, n_windows)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _fingerprint_runner(b"RIFF", hash_one), schema=PHASH_SCHEMA
    )


def perceptual_dup_pairs(
    media: DataFrame, max_hamming: int = 5, modality: str = "image"
) -> DataFrame:
    """Near-duplicate media pairs by fingerprint hamming distance, via
    the SAME pigeonhole 8-bit-chunk equi-join as text SimHash (dedup
    .simhash_pairs — never all-pairs): returns (media_a, media_b,
    hamming <= max_hamming).  ``modality`` picks the fingerprint:
    'image' -> :func:`perceptual_hash`, 'audio' ->
    :func:`audio_fingerprint`.  ``max_hamming`` is capped at 7: the
    8-chunk pigeonhole only guarantees recall up to hamming 7, and a
    larger bound would silently drop genuine pairs."""
    from tripwire_spark.operators.dedup import simhash_pairs

    if modality not in ("image", "audio"):
        raise ValueError(f"modality must be 'image' or 'audio', got {modality!r}")
    if max_hamming > 7:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 8-bit-chunk pigeonhole "
            "recall guarantee (<= 7 over 64 bits)"
        )
    fp = perceptual_hash if modality == "image" else audio_fingerprint
    sig = fp(media).select(
        F.col("media_id").alias("doc"), F.col("ahash").alias("simhash")
    )
    return simhash_pairs(sig, max_hamming=max_hamming).select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Frame sampling for video rows: pure column math (no decode) —
    one row per sampled timestamp."""
    vid = media.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.floor(F.col("duration_ms") / every_ms).cast("int"))
    return vid.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
    ).select("media_id", "frame_idx", F.col("frame_ts_ms").cast("int"))
