"""Multimodal column conventions: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched ``mapInPandas``
UDFs.

The container has no image/audio codecs, so the actual decode step is
STUBBED two ways (SURVEY.md north-star X7):

- :func:`decode_image` raises ``NotImplementedError`` unless PIL is
  importable — the real-codec slot, import-gated;
- :func:`fake_decode_meta` is a deterministic stand-in (dimensions derived
  from the bytes themselves) so the Spark-side plumbing — binary schema,
  Arrow batch shape, partition-parallel UDF execution — is REAL and
  oracle-checkable end-to-end.

The payloads here are utf-8 encodings of ``documents.text`` (the only bytes
in the test data), but nothing below inspects them as text: every operator
sees an opaque ``bytes`` value, exactly as it would see a JPEG. At 100 TB
the pattern holds: binary columns stay in parquet, ``mapInPandas`` streams
Arrow batches through Python workers partition-parallel, and metadata-only
queries never touch the payload column (column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_neo4j_spark.catalog import (
    documents_for_compute,
    load_table,
    table_for_compute,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def attach_payload(docs: DataFrame) -> DataFrame:
    """Documents -> multimodal rows: opaque binary payload + typed metadata
    struct. The metadata travels beside the blob so metadata-only queries
    prune the payload column entirely."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode(F.col("text"), "UTF-8")).alias("byte_len"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - codec not installed
    """Real-codec slot. Import-gated: raises NotImplementedError in
    environments without PIL (like this container)."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires pillow; this environment has no codecs — "
            "use fake_decode_meta for plumbing tests"
        ) from exc


def fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a decoder: (width, height, digest) derived
    purely from the bytes. Same formula is expressible in SQL, making the
    full binary->mapInPandas->metadata pipeline oracle-checkable."""
    width = len(payload) % 640
    height = payload[0] if payload else 0
    return width, height, hashlib.sha256(payload).hexdigest()


def extract_meta(multimodal: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column: one Arrow
    batch in, one metadata frame out, partition-parallel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "sha": [d[2] for d in decoded],
                }
            )

    return multimodal.mapInPandas(
        run, schema="doc_id long, width int, height int, sha string"
    )


def resize(multimodal: DataFrame, factor: int = 4) -> DataFrame:
    """'Resize' stub over opaque bytes: byte-subsample the payload by
    ``factor`` and refresh the metadata (new byte_len + digest of the resized
    payload). A real deployment swaps the kernel for PIL/ffmpeg inside the
    same mapInPandas shape — schema, Arrow batching, and partition
    parallelism are unchanged by the codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(p[::factor]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "byte_len": [len(p) for p in resized],
                    "sha": [hashlib.sha256(p).hexdigest() for p in resized],
                }
            )

    return multimodal.mapInPandas(
        run, schema="doc_id long, payload binary, byte_len int, sha string"
    )


def frame_sample(multimodal: DataFrame, stride: int = 100) -> DataFrame:
    """'Video frame sampling' over opaque bytes: take every ``stride``-th
    byte as a frame marker and report per-doc frame count + first-frame
    value. Demonstrates batched byte-slicing through Arrow without any
    codec; the formula is SQL-checkable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [p[::stride] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": [len(fr) for fr in frames],
                    "first_frame": [fr[0] if len(fr) else None for fr in frames],
                }
            )

    return multimodal.mapInPandas(
        run, schema="doc_id long, n_frames int, first_frame int"
    )


#: audio framing stand-in: 8-bit mono PCM, 400-sample windows, 200-sample hop
#: (the 25 ms / 10 ms analysis framing at 16 kHz, scaled to byte payloads).
AUDIO_WIN = 400
AUDIO_HOP = 200


def audio_windows(multimodal: DataFrame) -> DataFrame:
    """'Audio' sliding-window feature extraction over opaque bytes: treat the
    payload as 8-bit PCM samples and emit one row per (win, hop) frame with a
    windowed energy sum. This is the exact Arrow shape a real feature
    extractor (librosa/torchaudio STFT) runs in: a mapInPandas that EXPANDS
    rows (N docs in, N*windows out), numpy-vectorized inside the batch. The
    codec-free energy formula keeps it oracle-checkable; swapping in a real
    DSP kernel changes only the inner lambda, not the distribution shape.
    Partition parallelism and batch sizing are unchanged by the expansion —
    each input batch yields one output frame table, never a per-row loop in
    Spark."""
    import numpy as np

    def run(batches):
        for pdf in batches:
            out_doc, out_idx, out_start, out_energy = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.uint8)
                n = len(samples)
                if n < AUDIO_WIN:
                    continue
                n_win = (n - AUDIO_WIN) // AUDIO_HOP + 1
                starts = np.arange(n_win) * AUDIO_HOP
                # vectorized windowed sum via cumsum — O(n), not O(n*win)
                cs = np.concatenate(([0], np.cumsum(samples, dtype=np.int64)))
                energy = cs[starts + AUDIO_WIN] - cs[starts]
                out_doc.extend([doc_id] * n_win)
                out_idx.extend(range(n_win))
                out_start.extend(starts.tolist())
                out_energy.extend(energy.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "win_idx": out_idx,
                    "start_sample": out_start,
                    "energy_sum": out_energy,
                }
            )

    return multimodal.mapInPandas(
        run,
        schema="doc_id long, win_idx long, start_sample long, energy_sum long",
    )


# -- conformance queries ---------------------------------------------------


def m1_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_for_compute(spark, sf_dir)
    return extract_meta(attach_payload(docs)).orderBy("doc_id")


def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_for_compute(spark, sf_dir)
    return frame_sample(attach_payload(docs), stride=100).orderBy("doc_id")


def m3_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_for_compute(spark, sf_dir)
    return resize(attach_payload(docs), factor=4).select(
        "doc_id", "byte_len", "sha"
    ).orderBy("doc_id")


def m4_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_for_compute(spark, sf_dir)
    return audio_windows(attach_payload(docs)).orderBy("doc_id", "win_idx")


# M5 — training-sample assembly: the manifest join a multimodal training
# pipeline runs to stitch each example together from its modality tables —
# text stats from `documents`, the payload's typed metadata, and embedding
# features from `embeddings` — keyed on the shared sample id. Everything is
# JVM-side (one projection per side + one equi-join; the embedding norm is a
# codegen'd `aggregate` fold, no Python). At 100 TB both sides bucket/
# co-partition on the sample id so the join is shuffle-free; the payload
# bytes themselves are never read (column pruning keeps the scan to
# metadata).
def m5_sample_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_for_compute(spark, sf_dir)
    samples = docs.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).alias("byte_len"),
        F.col("source").alias("origin"),
        F.expr("size(split(trim(text), ' +'))").alias("n_tokens"),
    )
    emb = table_for_compute(spark, sf_dir, "embeddings").selectExpr(
        "vec_id AS doc_id",
        "label",
        "round(sqrt(aggregate(cast(embedding AS array<double>), 0D,"
        " (acc, v) -> acc + v * v)), 6) AS emb_norm",
    )
    return samples.join(emb, "doc_id").orderBy("doc_id")


#: image tiling stand-in: ViT-style fixed-size patch grid over the fake
#: decoder's (width, height); partial edge tiles keep their clipped size.
TILE = 64


def image_tiles(multimodal: DataFrame) -> DataFrame:
    """'Image tiling' over opaque bytes: enumerate the TILE x TILE patch
    grid covering each payload's fake-decoded (width, height) and emit one
    row per tile with its clipped geometry plus a probe byte sampled from
    the payload at a tile-determined offset. This is the ViT/patch-export
    distribution shape — a row-EXPANDING mapInPandas (N images -> N*tiles
    rows) where a real pipeline would slice pixel buffers; the probe-byte
    formula keeps the payload access oracle-checkable without a codec.
    Tile enumeration is numpy meshgrid per batch, never a per-tile Python
    loop; partition parallelism and Arrow batch shape are unchanged by the
    expansion."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "doc_id": [], "tile_x": [], "tile_y": [],
                "tile_w": [], "tile_h": [], "probe": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                width, height, _ = fake_decode_meta(payload)
                if width <= 0 or height <= 0:
                    continue
                nx = -(-width // TILE)
                ny = -(-height // TILE)
                tx, ty = np.meshgrid(np.arange(nx), np.arange(ny))
                tx, ty = tx.ravel(), ty.ravel()
                probe_idx = (ty * TILE * width + tx * TILE) % len(payload)
                buf = np.frombuffer(payload, dtype=np.uint8)
                cols["doc_id"].extend([doc_id] * len(tx))
                cols["tile_x"].extend(tx.tolist())
                cols["tile_y"].extend(ty.tolist())
                cols["tile_w"].extend(
                    np.minimum(TILE, width - tx * TILE).tolist()
                )
                cols["tile_h"].extend(
                    np.minimum(TILE, height - ty * TILE).tolist()
                )
                cols["probe"].extend(buf[probe_idx].tolist())
            yield pd.DataFrame(cols)

    return multimodal.mapInPandas(
        run,
        schema=(
            "doc_id long, tile_x int, tile_y int, "
            "tile_w int, tile_h int, probe int"
        ),
    )


def m6_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_for_compute(spark, sf_dir)
    return image_tiles(attach_payload(docs)).orderBy(
        "doc_id", "tile_y", "tile_x"
    )


#: scene-segmentation knobs: frame stride (reuses m2's framing) and the
#: feature-jump threshold that declares a scene boundary.
SCENE_STRIDE = 100
SCENE_THRESHOLD = 30


def scene_segments(multimodal: DataFrame, stride: int = SCENE_STRIDE) -> DataFrame:
    """'Video scene segmentation' over opaque payloads: frames are every
    ``stride``-th byte (m2's framing), the per-frame feature is the byte
    value, and a scene boundary is a feature jump > SCENE_THRESHOLD between
    consecutive frames — the shape of real shot detection (histogram/embedding
    distance over decoded frames), with the codec swapped for the
    deterministic byte probe so the whole thing stays oracle-checkable.

    Pure map: per-doc numpy over Arrow batches, no shuffle, output one row
    per doc (n_frames, n_scenes, longest run). At 100 TB this pipelines
    behind the scan with zero exchanges; the real-codec variant only swaps
    the feature function.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, nf, ns, longest = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                v = np.frombuffer(payload, dtype=np.uint8)[::stride].astype(
                    np.int64
                )
                n = len(v)
                if n == 0:
                    continue
                b = np.abs(np.diff(v)) > SCENE_THRESHOLD
                starts = np.concatenate(([0], np.flatnonzero(b) + 1))
                lengths = np.diff(np.append(starts, n))
                ids.append(doc_id)
                nf.append(n)
                ns.append(len(starts))
                longest.append(int(lengths.max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nf,
                    "n_scenes": ns,
                    "longest_scene": longest,
                }
            )

    return multimodal.mapInPandas(
        run, schema="doc_id long, n_frames int, n_scenes int, longest_scene int"
    )


def m7_scene_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_for_compute(spark, sf_dir)
    return scene_segments(attach_payload(docs)).orderBy("doc_id")


# M8 — audio-to-scene alignment (AV sync: attach each audio feature
# window to the video scene it falls inside — the cross-modality join a
# captioning/AV-training pipeline needs). The alignment key is the FRAME
# INDEX containing the window midpoint, so the "interval join" becomes a
# plain EQUI-join on (doc_id, frame_idx) — no range predicate, no
# nested-loop hazard; per-doc multiplicity is bounded by payload length,
# and the doc_id key distributes. Both modality tables derive
# declaratively (sequence + window functions — the m4/m7 kernels'
# batch-SQL twins), and energies are integer byte sums, so the rollup is
# exact on any layout.
def m8_av_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("bl")
    )
    frames = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), F.floor((F.col("bl") - 1) / SCENE_STRIDE).cast("int")
            )
        ).alias("idx"),
        "text",
    ).select(
        "doc_id",
        "idx",
        F.expr(f"ascii(substring(text, idx * {SCENE_STRIDE} + 1, 1))").alias(
            "v"
        ),
    )
    wlag = Window.partitionBy("doc_id").orderBy("idx")
    scenes = frames.select(
        "doc_id",
        "idx",
        F.when(
            F.abs(F.col("v") - F.lag("v").over(wlag)) > SCENE_THRESHOLD, 1
        )
        .otherwise(0)
        .alias("b"),
    ).select(
        "doc_id",
        "idx",
        F.sum("b")
        .over(wlag.rowsBetween(Window.unboundedPreceding, 0))
        .alias("scene"),
    )
    # Window energies: decode the text into ONE char-code array per doc
    # (split + transform, a single linear pass), then every overlapping
    # window is a slice-sum over that array. The previous form summed
    # ascii(substring(text, p, 1)) per position: each substring is an
    # O(p) UTF8String scan, so a window cost O(win x len) and a doc
    # O(len^2 / hop) — measured 4.5x the DuckDB oracle at sf1 (15.0 s vs
    # 3.3 s; DuckDB's ASCII fast path makes its substring O(1)). All the
    # per-doc array state stays INSIDE the row projection — only the
    # (len/hop)-element energy array survives to the explode, so nothing
    # wide is shuffled.
    vals_f = d.filter(F.col("bl") >= AUDIO_WIN).select(
        "doc_id",
        "bl",
        F.expr("transform(split(text, ''), c -> ascii(c))").alias("vals"),
    )
    energy_arr = F.expr(
        f"transform(sequence(0, cast(floor((bl - {AUDIO_WIN}) / "
        f"{AUDIO_HOP}) as int)), "
        f"w -> aggregate(slice(vals, w * {AUDIO_HOP} + 1, {AUDIO_WIN}), "
        "0L, (acc, x) -> acc + x))"
    )
    win_feat = vals_f.select(
        "doc_id", F.posexplode(energy_arr).alias("win_idx", "energy")
    ).select(
        "doc_id",
        "win_idx",
        "energy",
        (
            (F.col("win_idx") * AUDIO_HOP + AUDIO_WIN // 2) / SCENE_STRIDE
        )
        .cast("int")
        .alias("idx"),
    )
    return (
        win_feat.join(scenes, ["doc_id", "idx"])
        .groupBy("doc_id", "scene")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum("energy").alias("total_energy"),
        )
        .orderBy("doc_id", "scene")
    )


#: m9: minimum payload size that counts as a usable media asset.
COVERAGE_MIN_BYTES = 400


# M9 — modality coverage report (the dataset-card completeness table):
# per source, what fraction of samples have a usable payload, an
# embedding, and both — the first governance question about any
# multimodal corpus ("can we even train image+text on source X?").
# One LEFT join documents→embeddings on the sample id + one conditional
# aggregation per source; counts are integers, fractions divide once.
def m9_modality_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (
            F.length(F.encode(F.col("text"), "UTF-8")) >= COVERAGE_MIN_BYTES
        ).alias("has_payload"),
    )
    emb = table_for_compute(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.lit(True).alias("has_emb")
    )
    j = docs.join(emb, "doc_id", "left").select(
        "source",
        "has_payload",
        F.coalesce("has_emb", F.lit(False)).alias("has_emb"),
    )
    n = F.count("*")
    return (
        j.groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.sum(F.col("has_payload").cast("long")).alias("n_payload"),
            F.sum(F.col("has_emb").cast("long")).alias("n_emb"),
            F.sum(
                (F.col("has_payload") & F.col("has_emb")).cast("long")
            ).alias("n_both"),
            F.round(
                F.sum((F.col("has_payload") & F.col("has_emb")).cast("long"))
                / n,
                4,
            ).alias("trainable_frac"),
        )
        .orderBy("source")
    )


QUERIES: dict[str, QueryFn] = {
    "m9_modality_coverage": m9_modality_coverage,
    "m8_av_align": m8_av_align,
    "m7_scene_segments": m7_scene_segments,
    "m1_multimodal_meta": m1_multimodal_meta,
    "m6_image_tiles": m6_image_tiles,
    "m2_frame_sample": m2_frame_sample,
    "m3_resize": m3_resize,
    "m4_audio_windows": m4_audio_windows,
    "m5_sample_assembly": m5_sample_assembly,
}

ORACLE: dict[str, str] = {
    "m9_modality_coverage": f"""
        WITH j AS (
          SELECT d.source,
                 octet_length(encode(d.text)) >= {COVERAGE_MIN_BYTES}
                   AS has_payload,
                 e.vec_id IS NOT NULL AS has_emb
          FROM documents d
          LEFT JOIN embeddings e ON d.doc_id = e.vec_id)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN has_payload THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_payload,
               CAST(SUM(CASE WHEN has_emb THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_emb,
               CAST(SUM(CASE WHEN has_payload AND has_emb THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_both,
               ROUND(SUM(CASE WHEN has_payload AND has_emb THEN 1 ELSE 0
                     END) / CAST(COUNT(*) AS DOUBLE), 4) AS trainable_frac
        FROM j GROUP BY source ORDER BY source""",
    "m8_av_align": f"""
        WITH d AS (SELECT doc_id, text, length(text) AS bl FROM documents),
        g AS (
          SELECT doc_id, text,
                 unnest(generate_series(0, (bl - 1) // {SCENE_STRIDE})) AS idx
          FROM d),
        fr AS (
          SELECT doc_id, idx,
                 ascii(substring(text,
                   CAST(idx * {SCENE_STRIDE} + 1 AS INT), 1)) AS v
          FROM g),
        br AS (
          SELECT doc_id, idx,
                 CASE WHEN ABS(v - LAG(v) OVER (PARTITION BY doc_id
                                                ORDER BY idx))
                        > {SCENE_THRESHOLD} THEN 1 ELSE 0 END AS b
          FROM fr),
        sc AS (
          SELECT doc_id, idx,
                 SUM(b) OVER (PARTITION BY doc_id ORDER BY idx
                              ROWS UNBOUNDED PRECEDING) AS scene
          FROM br),
        wi AS (
          SELECT doc_id, text,
                 unnest(generate_series(
                   0, (bl - {AUDIO_WIN}) // {AUDIO_HOP})) AS win_idx
          FROM d WHERE bl >= {AUDIO_WIN}),
        wf AS (
          SELECT doc_id, win_idx,
                 CAST(list_sum([ascii(substring(text, p, 1))
                       for p in generate_series(
                           win_idx * {AUDIO_HOP} + 1,
                           win_idx * {AUDIO_HOP} + {AUDIO_WIN})]) AS BIGINT)
                   AS energy,
                 CAST((win_idx * {AUDIO_HOP} + {AUDIO_WIN // 2})
                      // {SCENE_STRIDE} AS INT) AS idx
          FROM wi)
        SELECT wf.doc_id, CAST(sc.scene AS BIGINT) AS scene,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(wf.energy) AS BIGINT) AS total_energy
        FROM wf JOIN sc ON wf.doc_id = sc.doc_id AND wf.idx = sc.idx
        GROUP BY wf.doc_id, sc.scene
        ORDER BY wf.doc_id, scene""",
    "m7_scene_segments": f"""
        WITH d AS (SELECT doc_id, text, length(text) AS bl FROM documents),
        g AS (
          SELECT doc_id, text,
                 unnest(generate_series(0, (bl - 1) // {SCENE_STRIDE})) AS idx
          FROM d),
        fr AS (
          SELECT doc_id, idx,
                 ascii(substring(text,
                   CAST(idx * {SCENE_STRIDE} + 1 AS INT), 1)) AS v
          FROM g),
        df AS (
          SELECT doc_id, idx,
                 CASE WHEN ABS(v - LAG(v) OVER (PARTITION BY doc_id
                                                ORDER BY idx))
                        > {SCENE_THRESHOLD}
                      THEN 1 ELSE 0 END AS b
          FROM fr),
        seg AS (
          SELECT doc_id, idx,
                 SUM(b) OVER (PARTITION BY doc_id ORDER BY idx
                              ROWS UNBOUNDED PRECEDING) AS s
          FROM df),
        seglen AS (
          SELECT doc_id, s, COUNT(*) AS len FROM seg GROUP BY doc_id, s)
        SELECT doc_id, CAST(SUM(len) AS INT) AS n_frames,
               CAST(COUNT(*) AS INT) AS n_scenes,
               CAST(MAX(len) AS INT) AS longest_scene
        FROM seglen GROUP BY doc_id ORDER BY doc_id""",
    # ascii corpus: payload byte k (0-based) == ascii(substring(text, k+1));
    # the tile grid is pure integer geometry over the fake-decoded dims.
    "m6_image_tiles": f"""
        WITH d AS (
          SELECT doc_id, text, length(text) AS bl,
                 length(text) % 640 AS w,
                 ascii(substring(text, 1, 1)) AS h
          FROM documents
          WHERE length(text) % 640 > 0 AND ascii(substring(text, 1, 1)) > 0),
        gx AS (
          SELECT *, unnest(generate_series(
                   0, CAST(ceil(w * 1.0 / {TILE}) AS BIGINT) - 1)) AS tx
          FROM d),
        gxy AS (
          SELECT *, unnest(generate_series(
                   0, CAST(ceil(h * 1.0 / {TILE}) AS BIGINT) - 1)) AS ty
          FROM gx)
        SELECT doc_id,
               CAST(tx AS INT) AS tile_x, CAST(ty AS INT) AS tile_y,
               CAST(LEAST({TILE}, w - tx * {TILE}) AS INT) AS tile_w,
               CAST(LEAST({TILE}, h - ty * {TILE}) AS INT) AS tile_h,
               CAST(ascii(substring(text,
                 CAST((ty * {TILE} * w + tx * {TILE}) % bl AS INT) + 1, 1))
                 AS INT) AS probe
        FROM gxy ORDER BY doc_id, tile_y, tile_x""",
    "m5_sample_assembly": """
        WITH d AS (
          SELECT doc_id,
                 CAST(length(text) AS INT) AS byte_len,
                 source AS origin,
                 CAST(len(string_split_regex(trim(text), ' +')) AS INT) AS n_tokens
          FROM documents),
        e AS (
          SELECT vec_id AS doc_id, label,
                 ROUND(sqrt(list_sum([x * x for x in embedding::DOUBLE[]])), 6)
                   AS emb_norm
          FROM embeddings)
        SELECT doc_id, byte_len, origin, n_tokens, label, emb_norm
        FROM d JOIN e USING (doc_id) ORDER BY doc_id""",
    # corpus text is ascii, so octet length == char length and byte values
    # == ascii codes; the oracle states the same byte-level formulas in SQL.
    "m1_multimodal_meta": """
        SELECT doc_id,
               CAST(length(text) % 640 AS INT) AS width,
               CAST(ascii(substring(text, 1, 1)) AS INT) AS height,
               sha256(text) AS sha
        FROM documents ORDER BY doc_id""",
    "m2_frame_sample": """
        SELECT doc_id,
               CAST(ceil(length(text) / 100.0) AS INT) AS n_frames,
               CAST(ascii(substring(text, 1, 1)) AS INT) AS first_frame
        FROM documents ORDER BY doc_id""",
    # byte-subsample by 4 == char-subsample for ascii; same digest formula.
    "m3_resize": """
        WITH r AS (
          SELECT doc_id,
                 array_to_string(
                   [substring(text, i, 1) for i in generate_series(1, length(text), 4)],
                   '') AS resized
          FROM documents
        )
        SELECT doc_id,
               CAST(length(resized) AS INT) AS byte_len,
               sha256(resized) AS sha
        FROM r ORDER BY doc_id""",
    # ascii text: byte k (0-based) == ascii(substring(text, k+1, 1)); the
    # windowed energy sum is a plain character-code sum over the window.
    "m4_audio_windows": f"""
        WITH w AS (
          SELECT doc_id, text,
                 unnest(generate_series(
                   0, CAST(floor((length(text) - {AUDIO_WIN}) * 1.0
                                 / {AUDIO_HOP}) AS BIGINT))) AS win_idx
          FROM documents WHERE length(text) >= {AUDIO_WIN})
        SELECT doc_id, win_idx,
               win_idx * {AUDIO_HOP} AS start_sample,
               CAST(list_sum([ascii(substring(text, p, 1))
                         for p in generate_series(
                             win_idx * {AUDIO_HOP} + 1,
                             win_idx * {AUDIO_HOP} + {AUDIO_WIN})]) AS BIGINT)
                 AS energy_sum
        FROM w ORDER BY doc_id, win_idx""",
}
