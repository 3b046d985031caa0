"""Sequence-packing plan — the training-data prep step that turns a
corpus of variable-length token sequences into fixed-size context
windows (GPT-style "concatenate the stream, chunk every C tokens").

This operator computes the PLAN (which document lands where), not the
physical token movement: each document gets its offset in the
concatenated token stream of its partition, from which its pack id,
in-pack offset, and whether it straddles a pack boundary all follow
arithmetically.  The physical gather is then a shuffle by
``pack_id`` — whose fan-out this plan makes exactly predictable.

Pure Catalyst: one window cumulative sum per partition (shuffle keyed
by the stream partition, e.g. ``source``), everything else is
projection arithmetic.  Deterministic: the stream order is an explicit
``order_col`` (ties impossible on a unique id), so the same corpus
always packs identically — the property that makes training runs
reproducible and resumable.

Scale shape: parallelism = #stream partitions; a single stream is the
degenerate case (one window task) — shard the stream (e.g. by
``source`` or a hash bucket) exactly as a real pipeline shards its
data-loader workers.  State per task = running sum, O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_assignments(df: DataFrame, context_len: int,
                     n_tok_col: str = "n_tok",
                     order_col: str = "doc_id",
                     stream_col: str | None = "source") -> DataFrame:
    """Input rows + the packing plan columns:

    * ``stream_offset`` — first token's offset in the partition's
      concatenated stream (0-based);
    * ``pack_id`` — which ``context_len`` window that first token lands
      in (0-based, per stream);
    * ``pack_offset`` — offset within that window;
    * ``n_packs_spanned`` — how many windows the document touches (> 1
      = it straddles at least one boundary and will be split).

    Documents with NULL or non-positive token counts contribute zero
    stream length (they pack nowhere; ``n_packs_spanned`` = 0).
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    parts = [stream_col] if stream_col else []
    w = Window.partitionBy(*parts).orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n = F.coalesce(F.col(n_tok_col), F.lit(0))
    n = F.when(n > 0, n).otherwise(F.lit(0))
    cum = F.sum(n).over(w)
    c = F.lit(context_len)
    return (df.withColumn("stream_offset", cum - n)
            .withColumn("pack_id",
                        F.floor(F.col("stream_offset") / c))
            .withColumn("pack_offset",
                        F.col("stream_offset") % c)
            .withColumn("n_packs_spanned",
                        F.when(n == 0, F.lit(0)).otherwise(
                            F.floor((F.col("stream_offset") + n - 1) / c)
                            - F.col("pack_id") + 1)))


def pack_stats(df: DataFrame, context_len: int,
               n_tok_col: str = "n_tok", order_col: str = "doc_id",
               stream_col: str | None = "source") -> DataFrame:
    """Per-stream packing summary: total tokens, number of packs, the
    tail pack's fill ratio, and how many documents straddle a pack
    boundary — the numbers a pipeline owner checks before paying for
    the physical shuffle."""
    a = pack_assignments(df, context_len, n_tok_col, order_col, stream_col)
    parts = [stream_col] if stream_col else []
    n = F.coalesce(F.col(n_tok_col), F.lit(0))
    n = F.when(n > 0, n).otherwise(F.lit(0))
    tot = F.sum(n)
    c = F.lit(context_len)
    return (a.groupBy(*parts)
            .agg(tot.alias("total_tokens"),
                 F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("n_packs_spanned") > 1).cast("long"))
                 .alias("n_straddling"),
                 F.ceil(tot / c).alias("n_packs"),
                 F.when(tot % c == 0, F.lit(1.0))
                 .otherwise((tot % c) / c).alias("tail_fill")))


def chunk_tokens(df: DataFrame, chunk_size: int, stride: int | None = None,
                 tokens_col: str = "tokens", id_col: str = "doc_id",
                 min_chunk: int = 1, keep_tokens: bool = True) -> DataFrame:
    """Split every sequence into (optionally overlapping) token
    windows — the embedding/RAG prep step: ``chunk_size``-token windows
    every ``stride`` tokens (default ``stride = chunk_size`` →
    non-overlapping).  Emits one row per chunk: ``(id, chunk_id,
    chunk_start, chunk_len, [chunk_tokens])`` with ``chunk_start``
    0-based and windows shorter than ``min_chunk`` (the tail, when
    ``stride < chunk_size`` duplicates would make it redundant)
    dropped.  NULL/empty token arrays produce no chunks.

    Scale shape: pure projection + ``posexplode`` — NO shuffle at all;
    the chunk rows land in their parent's partition, ready for a
    downstream embed/``mapInPandas`` stage.  Chunk ids and boundaries
    are pure functions of the array length, so any engine reproduces
    them.
    """
    stride = stride or chunk_size
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.col(tokens_col)
    n = F.array_size(toks)
    # starts: 1, 1+stride, ... while start <= n (1-based for slice)
    starts = F.when(n >= 1, F.sequence(F.lit(1), n, F.lit(stride))) \
        .otherwise(F.array().cast("array<int>"))
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk_size))
    out = (df.select(F.col(id_col),
                     F.posexplode(chunks).alias("chunk_id", "chunk_tokens"))
           .withColumn("chunk_start",
                       (F.col("chunk_id") * stride).cast("long"))
           .withColumn("chunk_len",
                       F.array_size("chunk_tokens").cast("long"))
           .filter(F.col("chunk_len") >= min_chunk))
    cols = [id_col, "chunk_id", "chunk_start", "chunk_len"]
    if keep_tokens:
        cols.append("chunk_tokens")
    return out.select(*cols)
