"""Structured Streaming operators — SURVEY §2.11 (T2/T3) + event-time
windows/watermarks (the idiomatic-Spark generalization the reference's
delivery streams imply).

The reference's genuinely stateful stream op is incremental sentence
segmentation with a carry-over buffer (``streaming_tts_service.py:25-69``):
text chunks arrive per session; complete sentences (terminated by one of
``. ! ? 。``) are emitted as they form; the trailing partial stays buffered,
with a partial-flush policy (suffix ``, ; : -`` or ≥20 chars).

Spark form: ``applyInPandasWithState`` keyed by session — the buffer is the
group state, each micro-batch appends its chunks in sequence order and emits
completed sentences. Scales horizontally: state is per-key, shuffled once.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DELIMS = (".", "!", "?", "。", "！", "？", "\n")
# Partial-flush requires the suffix-plus-space form (', ', '; ', ': ', ' - ')
# on the UNSTRIPPED buffer — streaming_tts_service.py:56-63.
FLUSH_SUFFIXES = (", ", "; ", ": ", " - ")
FLUSH_MIN_CHARS = 20

OUTPUT_SCHEMA = "session_id string, seq long, sentence string"
STATE_SCHEMA = "buffer string, emitted long"


def split_complete(buffer: str) -> tuple[list[str], str]:
    """Earliest-delimiter scan: pull every complete sentence off the front
    of ``buffer``; return (sentences, remaining partial). Deterministic,
    pure — shared by the streaming op and its batch analog/tests.
    (Reference: streaming_tts_service.py:25-54.)"""
    sentences: list[str] = []
    rest = buffer
    while True:
        cut = -1
        for i, ch in enumerate(rest):
            if ch in DELIMS:
                cut = i
                break
        if cut == -1:
            break
        sent = rest[: cut + 1].strip()
        if sent:
            sentences.append(sent)
        rest = rest[cut + 1 :]
    return sentences, rest


def should_flush_partial(buffer: str) -> bool:
    """T3 partial-flush policy: flush on a clause suffix (checked on the
    unstripped text — ', '/'; '/': '/' - ') or when the stripped text is
    ≥20 chars (streaming_tts_service.py:56-69)."""
    if buffer.endswith(FLUSH_SUFFIXES):
        return True
    return len(buffer.strip()) >= FLUSH_MIN_CHARS


def segment_group(
    key: tuple[str],
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body: append chunks (in seq order) to the
    buffered partial, emit completed sentences with running sequence
    numbers. After draining the micro-batch, apply the T3 partial-flush
    policy (clause suffix or ≥20 chars → emit the partial early,
    streaming_tts_service.py:56-69)."""
    (session_id,) = key
    if state.exists:
        buffer, emitted = state.get
    else:
        buffer, emitted = "", 0

    out_rows: list[tuple[str, int, str]] = []
    # concat ALL Arrow batches before the single global sort: a group
    # larger than maxRecordsPerBatch spans multiple pdfs whose relative
    # order is shuffle-fetch order — sorting each pdf independently
    # would append later-seq chunks before earlier ones and garble the
    # reassembled text. NULL chunks carry no text; dropna, not crash.
    pdfs = [pdf for pdf in pdf_iter]
    if pdfs:
        merged = pd.concat(pdfs, ignore_index=True).sort_values("chunk_seq")
        for chunk in merged["chunk"].dropna():
            buffer += chunk
            done, buffer = split_complete(buffer)
            for s in done:
                out_rows.append((session_id, emitted, s))
                emitted += 1

    # suffix-only buffers (', ') flush to an empty string — emit nothing
    # rather than an empty sentence row (and don't burn a seq number).
    if should_flush_partial(buffer) and buffer.strip():
        out_rows.append((session_id, emitted, buffer.strip()))
        emitted += 1
        buffer = ""
    elif should_flush_partial(buffer):
        buffer = ""

    state.update((buffer, emitted))
    yield pd.DataFrame(out_rows, columns=["session_id", "seq", "sentence"])


def segment_sentences_stream(chunks: DataFrame) -> DataFrame:
    """Wire the stateful segmentation over a streaming DataFrame of
    (session_id string, chunk_seq long, chunk string)."""
    return chunks.groupBy("session_id").applyInPandasWithState(
        segment_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_events_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps the first row per key and
    expires key state once the watermark passes — the streaming twin of
    ``dedup_min_event``/``exact_dup_groups``. Plain ``dropDuplicates`` on
    a stream retains every key forever; the watermark variant is the only
    shape whose state is O(keys-in-window), which is what an unbounded
    ingest pipeline needs."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed counts with a watermark (late rows beyond the
    watermark are dropped) — T-analog over the driver's events shape."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
