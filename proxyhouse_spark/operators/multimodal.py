"""Multimodal-column plumbing (SURVEY §2.11; north-star requirement).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The container has no decode libraries, so the decode step is a
clearly-marked deterministic fake behind the same seam a real decoder
would use — but the Spark-side plumbing is real and tested:

- binary column materialization (``encode(text)`` stands in for raw media
  bytes — the fixture set has no binary column),
- metadata projection (byte length, content hash, magic-prefix hex) as
  built-in expressions → oracle-checkable,
- feature extraction as ``mapInPandas`` over Arrow batches — the correct
  shape for CPU-heavy per-item decode at scale: batch-columnar transfer,
  per-partition parallelism, no driver involvement. Swapping the fake
  ``_decode_features`` for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table

# Feature schema produced by the extractor (fixed width = stable contract).
# Moments are EXACT INTEGERS (sum and sum-of-squares of byte values), not
# mean/std doubles: integer moments are bit-identical across engines (and
# trivially yield mean/std downstream), which upgrades this mapInPandas
# path from a rows-only check to a full DuckDB differential oracle.
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, byte_sum bigint, byte_sumsq bigint, "
    "head_byte int, tail_byte int"
)

# Real-decoder seam: the flag is derived from what is actually importable,
# so the True branch IS the real-decode path (r2 verdict flagged the old
# inversion, where flipping the flag raised instead of decoding). This
# container ships no media libs → False → deterministic fake.
try:  # pragma: no cover - not installed in this container
    from PIL import Image as _PILImage  # type: ignore

    HAVE_REAL_DECODER = True
except ImportError:
    _PILImage = None
    HAVE_REAL_DECODER = False


def _decode_features_real(payload: bytes) -> tuple[int, int, int, int]:
    """Real media decode (taken when PIL is importable): decode → grayscale
    → 16×16 resize-normalize, then the SAME integer byte moments over the
    decoded pixel buffer, so the output contract is identical to the fake
    path and everything downstream is unchanged."""
    import io

    px = _PILImage.open(io.BytesIO(payload)).convert("L").resize((16, 16)).tobytes()
    return sum(px), sum(b * b for b in px), px[0], px[-1]


def _decode_features(payload: bytes) -> tuple[int, int, int, int]:
    """Per-item decode dispatch: real decoder when available, else a
    deterministic stand-in (byte moments over the raw payload). The Spark
    plumbing (schema, batching, partitioning) is identical either way.
    """
    if not payload:
        return 0, 0, -1, -1
    if HAVE_REAL_DECODER:  # pragma: no cover - no media libs in container
        return _decode_features_real(bytes(payload))
    return (
        sum(payload),
        sum(b * b for b in payload),
        payload[0],
        payload[-1],
    )


def multimodal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-materialized as an opaque binary payload column."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("media_source"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary column — pure built-ins."""
    mm = multimodal_frame(spark, sf_dir)
    return mm.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.hex(F.expr("substring(payload, 1, 8)")).alias("magic_hex"),
    )


def multimodal_meta_oracle() -> str:
    return """
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           hex(encode(substr(text, 1, 8))) AS magic_hex
    FROM documents
    """


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item feature extraction via mapInPandas (Arrow-batched; the
    decode path a real image/audio pipeline would take). Integer-moment
    outputs make the Python path fully differentially checkable."""
    mm = multimodal_frame(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "byte_sum": pd.Series([f[0] for f in feats], dtype="int64"),
                    "byte_sumsq": pd.Series([f[1] for f in feats], dtype="int64"),
                    "head_byte": [f[2] for f in feats],
                    "tail_byte": [f[3] for f in feats],
                }
            )

    return mm.mapInPandas(extract, FEATURE_SCHEMA)


def multimodal_features_oracle() -> str:
    """The fixture corpus is pure ASCII, so byte values == codepoints and
    the Python byte loop is re-expressible as codepoint arithmetic."""
    codes = "list_transform(range(1, length(text) + 1), i -> unicode(substr(text, i, 1)))"
    return f"""
    WITH c AS (SELECT doc_id, text, {codes} AS codes FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(coalesce(list_sum(codes), 0) AS BIGINT) AS byte_sum,
           CAST(coalesce(list_sum(list_transform(codes, c -> c * c)), 0) AS BIGINT)
             AS byte_sumsq,
           CAST(CASE WHEN length(text) = 0 THEN -1 ELSE codes[1] END AS INT)
             AS head_byte,
           CAST(CASE WHEN length(text) = 0 THEN -1 ELSE codes[-1] END AS INT)
             AS tail_byte
    FROM c
    """


# ---------------------------------------------------------------------------
# Frame sampling — the video-shaped operation: payload = sequence of
# fixed-size frames; sample every SAMPLE_STRIDE-th frame. The Python side
# is real mapInPandas plumbing; the outputs are deliberately chosen to be
# SQL-expressible so this Arrow-batched path gets a FULL differential
# oracle (unlike q_multimodal_features' statistical outputs).
# ---------------------------------------------------------------------------

FRAME_BYTES = 16
SAMPLE_STRIDE = 4

FRAME_SCHEMA = (
    "doc_id bigint, n_frames bigint, n_sampled bigint, "
    "first_frame_hex string, last_frame_hex string"
)


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every SAMPLE_STRIDE-th FRAME_BYTES-sized frame of each binary
    payload via mapInPandas (the keyframe-extraction shape: per-item
    variable-length output derived batch-columnar, no driver involvement).
    A real video pipeline swaps the byte-slice for an ffmpeg keyframe
    decode; schema, batching and partitioning are identical."""
    mm = multimodal_frame(spark, sf_dir)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_frames", "n_sampled",
                                   "first_frame_hex", "last_frame_hex")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                n_frames = (len(p) + FRAME_BYTES - 1) // FRAME_BYTES
                frames = [
                    p[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    for i in range(0, n_frames, SAMPLE_STRIDE)
                ]
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["n_sampled"].append(len(frames))
                out["first_frame_hex"].append(frames[0].hex().upper())
                out["last_frame_hex"].append(frames[-1].hex().upper())
            yield pd.DataFrame(out)

    return mm.mapInPandas(sample, FRAME_SCHEMA)


def frame_sample_oracle() -> str:
    fb, st = FRAME_BYTES, SAMPLE_STRIDE
    n_frames = f"CAST(ceil(octet_length(encode(text)) / {fb}.0) AS BIGINT)"
    n_sampled = f"CAST(ceil({n_frames} / {st}.0) AS BIGINT)"
    last_start = f"(({n_sampled} - 1) * {st} * {fb} + 1)"
    return f"""
    SELECT doc_id, {n_frames} AS n_frames, {n_sampled} AS n_sampled,
           hex(encode(substr(text, 1, {fb}))) AS first_frame_hex,
           hex(encode(substr(text, {last_start}, {fb}))) AS last_frame_hex
    FROM documents
    """


# ---------------------------------------------------------------------------
# Resize — the image-shaped transform: nearest-neighbor downsample as
# byte-stream decimation (keep every RESIZE_STRIDE-th byte — exactly the
# sampling a 4:1 nearest-neighbor image resize performs on a row-major
# grayscale buffer). Real mapInPandas plumbing; a real pipeline swaps the
# decimation for PIL/partial ffmpeg scale with identical schema/batching.
# Outputs (sizes, md5 of the resized payload, byte sum) are chosen
# SQL-expressible so the Arrow path gets a FULL differential oracle,
# like frame_sample.
# ---------------------------------------------------------------------------

RESIZE_STRIDE = 4

RESIZE_SCHEMA = (
    "doc_id bigint, n_bytes_in bigint, n_bytes_out bigint, "
    "resized_md5 string, out_byte_sum bigint"
)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    mm = multimodal_frame(spark, sf_dir)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_bytes_in", "n_bytes_out",
                                   "resized_md5", "out_byte_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                r = p[::RESIZE_STRIDE]
                out["doc_id"].append(doc_id)
                out["n_bytes_in"].append(len(p))
                out["n_bytes_out"].append(len(r))
                out["resized_md5"].append(hashlib.md5(r).hexdigest())
                out["out_byte_sum"].append(sum(r))
            yield pd.DataFrame(out)

    return mm.mapInPandas(resize, RESIZE_SCHEMA)


def multimodal_resize_oracle() -> str:
    st = RESIZE_STRIDE
    # ASCII fixture: byte k of the payload == codepoint of char k+1, so
    # decimation re-expresses as an every-st-th-char rebuild
    resized = (
        f"array_to_string(list_transform(range(1, length(text) + 1, {st}), "
        "i -> substr(text, i, 1)), '')"
    )
    return f"""
    WITH r AS (SELECT doc_id, text, {resized} AS rz FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes_in,
           CAST(length(rz) AS BIGINT) AS n_bytes_out,
           md5(rz) AS resized_md5,
           CAST(coalesce(list_sum(list_transform(range(1, length(rz) + 1),
                i -> unicode(substr(rz, i, 1)))), 0) AS BIGINT) AS out_byte_sum
    FROM r
    """


# ---------------------------------------------------------------------------
# Audio VAD — the audio-shaped operation closing the modality triad
# (meta/features/resize = image, frame_sample = video, this = audio):
# treat the payload as a PCM sample stream, slice it into fixed
# AUDIO_WIN-sample windows, score each window's activity, and emit the
# voice-activity trim (first/last active window + density) — the
# silence-strip every ASR ingest pipeline runs before the expensive
# model. The deterministic fake scores activity as "enough non-0x20
# samples" (the fixture's spaces literally ARE the silence); a real
# pipeline swaps the scorer for an energy/ZCR threshold over decoded
# PCM with identical schema, batching and windowing arithmetic. The
# mapInPandas plumbing is real, and the outputs are integer-exact, so
# the Arrow path gets the FULL differential oracle like its siblings.
# ---------------------------------------------------------------------------

AUDIO_WIN = 64  # samples (bytes) per analysis window
AUDIO_MIN_ACTIVE = 8  # non-silence samples for a window to count active

VAD_SCHEMA = (
    "doc_id bigint, n_windows bigint, n_active bigint, "
    "first_active bigint, last_active bigint, active_bp bigint"
)


def audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N132: windowed voice-activity trim over the binary payload."""
    mm = multimodal_frame(spark, sf_dir)

    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {k: [] for k in (
            "doc_id", "n_windows", "n_active", "first_active",
            "last_active", "active_bp",
        )}
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_win = (len(b) + AUDIO_WIN - 1) // AUDIO_WIN
                active = [
                    sum(
                        1
                        for c in b[w * AUDIO_WIN:(w + 1) * AUDIO_WIN]
                        if c != 0x20
                    ) >= AUDIO_MIN_ACTIVE
                    for w in range(n_win)
                ]
                n_act = sum(active)
                first = active.index(True) + 1 if n_act else 0
                last = (
                    len(active) - active[::-1].index(True) if n_act else 0
                )
                rows["doc_id"].append(int(doc_id))
                rows["n_windows"].append(n_win)
                rows["n_active"].append(n_act)
                rows["first_active"].append(first)
                rows["last_active"].append(last)
                rows["active_bp"].append(
                    10000 * n_act // n_win if n_win else 0
                )
        yield pd.DataFrame(rows)

    return mm.mapInPandas(vad, VAD_SCHEMA)


def audio_vad_oracle() -> str:
    w, m = AUDIO_WIN, AUDIO_MIN_ACTIVE
    # per-window active flags as a list over the ASCII payload: a window
    # is active iff its non-space count clears the threshold
    flags = (
        f"list_transform(range(0, CAST(ceil(length(text) / {w}.0) AS BIGINT)), "
        f"wi -> length(replace(substr(text, wi * {w} + 1, {w}), ' ', '')) "
        f">= {m})"
    )
    return f"""
    WITH f AS (SELECT doc_id,
                      CAST(ceil(length(text) / {w}.0) AS BIGINT) AS n_windows,
                      {flags} AS fl
               FROM documents),
    a AS (SELECT doc_id, n_windows, fl,
                 CAST(coalesce(list_sum(list_transform(fl,
                        x -> CASE WHEN x THEN 1 ELSE 0 END)), 0) AS BIGINT)
                   AS n_active,
                 list_transform(range(1, len(fl) + 1),
                                i -> CASE WHEN fl[i] THEN i END) AS idx
          FROM f)
    SELECT doc_id, n_windows, n_active,
           CAST(coalesce(list_min(list_filter(idx, x -> x IS NOT NULL)), 0)
                AS BIGINT) AS first_active,
           CAST(coalesce(list_max(list_filter(idx, x -> x IS NOT NULL)), 0)
                AS BIGINT) AS last_active,
           CAST(CASE WHEN n_windows = 0 THEN 0
                     ELSE 10000 * n_active // n_windows END AS BIGINT)
             AS active_bp
    FROM a
    """


# ---------------------------------------------------------------------------
# phash_neardup — PERCEPTUAL-hash near-duplicate detection over the
# binary payload column: the multimodal face of the dedup family.
# md5 (multimodal_meta) only catches byte-identical media; an average
# hash (aHash) survives the re-encodes and minor edits that change
# bytes but not content. Pipeline: decode → 64-"pixel" grid → threshold
# at the global mean → 64-bit fingerprint → pigeonhole band join →
# Hamming cut (the q_simhash_wide machinery pointed at media).
#
# The grid here is the decode stand-in (byte means over 64 equal
# chunks of the payload — exactly what aHash computes on a row-major
# grayscale buffer after resize); a real deployment swaps the chunk
# step for PIL's resize((8,8)) inside the SAME mapInPandas, as
# _decode_features_real demonstrates. Bits are an exact integer
# comparison (chunk_sum·len > total_sum·chunk_len — cross-multiplied,
# no float means), so the Arrow path carries a FULL DuckDB differential
# oracle that rebuilds the grid in SQL from the ASCII fixture.
#
# The corpus is the dedup family's planted one (exact copies at
# +1,000,000; first-word-dropped excerpts at +2,000,000): exact copies
# MUST land at Hamming 0; excerpts shift every chunk boundary by one
# word and land wherever they land — both engines agree on the cut.
#
# Scale: fingerprints are 2×32-bit ints; 4×16-bit pigeonhole bands,
# SHUFFLE_HASH, never a corpus broadcast (the minhash lesson); the
# fingerprint frame is staged once.
# ---------------------------------------------------------------------------

PHASH_CHUNKS = 64
PHASH_HAMMING = 6

_PHASH_SCHEMA = "doc_id bigint, hi bigint, lo bigint"


def _ahash_bits(payload: bytes) -> tuple[int, int]:
    """64-bit aHash as (hi, lo) 32-bit halves — pure integer arithmetic,
    mirrored exactly by the SQL oracle."""
    n = len(payload)
    if n == 0:
        return 0, 0
    total = sum(payload)
    sums = [0] * PHASH_CHUNKS
    lens = [0] * PHASH_CHUNKS
    for p, b in enumerate(payload):
        c = p * PHASH_CHUNKS // n
        sums[c] += b
        lens[c] += 1
    hi = lo = 0
    for i in range(PHASH_CHUNKS):
        if sums[i] * n > total * lens[i]:
            if i < 32:
                lo |= 1 << i
            else:
                hi |= 1 << (i - 32)
    return hi, lo


def phash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.corpus import doc_corpus

    corpus = doc_corpus(spark, sf_dir).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "hi": [], "lo": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                hi, lo = _ahash_bits(bytes(payload))
                out["doc_id"].append(doc_id)
                out["hi"].append(hi)
                out["lo"].append(lo)
            yield pd.DataFrame(out)

    return corpus.mapInPandas(hash_batches, _PHASH_SCHEMA)


def _phash_pairs(band: str, explode4: str, hint: str, ham: str) -> str:
    return f"""
    bands AS (
      SELECT doc_id, hi, lo, p, {band} AS band
      FROM s {explode4}),
    pairs AS (
      SELECT {hint} DISTINCT
             a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
      FROM bands a JOIN bands b
        ON a.p = b.p AND a.band = b.band AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST({ham} AS INT) AS hamming
    FROM pairs
    WHERE {ham} <= {PHASH_HAMMING}
"""


def phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N157: aHash near-dup over media payloads (Arrow decode path)."""
    from ..checkpoints import scoped_checkpoint

    s = scoped_checkpoint(phash_frame(spark, sf_dir), "phash_frame")
    s.createOrReplaceTempView("phash_v")
    return spark.sql(
        "WITH s AS (SELECT * FROM phash_v),"
        + _phash_pairs(
            band="shiftright(CASE WHEN p < 2 THEN lo ELSE hi END,"
                 " 16 * (p % 2)) & 65535",
            explode4="LATERAL VIEW explode(sequence(0, 3)) t AS p",
            hint="/*+ SHUFFLE_HASH(a, b) */",
            ham="bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)",
        )
    )


def phash_neardup_oracle() -> str:
    from ..sources.corpus import DOC_CORPUS_SQL

    n = PHASH_CHUNKS
    return (
        f"""
    WITH corpus AS ({DOC_CORPUS_SQL}),
    pos AS (SELECT doc_id, (i - 1) * {n} // length(text) AS chunk,
                   unicode(substr(text, i, 1)) AS b
            FROM corpus, unnest(range(1, length(text) + 1)) AS t(i)),
    tot AS (SELECT doc_id, CAST(sum(b) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS len
            FROM pos GROUP BY doc_id),
    ch AS (SELECT doc_id, chunk, CAST(sum(b) AS BIGINT) AS c,
                  CAST(count(*) AS BIGINT) AS l
           FROM pos GROUP BY doc_id, chunk),
    bits AS (SELECT c.doc_id, c.chunk,
                    CASE WHEN c.c * t.len > t.total * c.l
                         THEN 1 ELSE 0 END AS bit
             FROM ch c JOIN tot t ON t.doc_id = c.doc_id),
    s AS (SELECT doc_id,
                 CAST(coalesce(sum(CASE WHEN chunk >= 32 THEN
                      bit * (CAST(1 AS BIGINT) << (chunk - 32)) END), 0)
                   AS BIGINT) AS hi,
                 CAST(coalesce(sum(CASE WHEN chunk < 32 THEN
                      bit * (CAST(1 AS BIGINT) << chunk) END), 0)
                   AS BIGINT) AS lo
          FROM bits GROUP BY doc_id),
"""
        + _phash_pairs(
            band="((CASE WHEN p < 2 THEN lo ELSE hi END)"
                 " >> (16 * (p % 2))) & 65535",
            explode4=", range(0, 4) AS t(p)",
            hint="",
            ham="bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))",
        )
    )
