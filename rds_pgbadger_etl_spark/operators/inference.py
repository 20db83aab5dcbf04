"""Batch embedding inference plumbing (SURVEY X3/X5 companion).

The one training-data-pipeline stage the engine did not yet model: the
GPU batch-inference pass that turns curated text into embedding vectors
(the input to the ANN/semantic-dedup family). The Spark side of that
stage is real and tested here — ``mapInPandas`` with Arrow-batched
transfer, a stable output schema, a map-only plan (zero shuffle: pinned
by tests), and batch sizes bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (the knob that bounds
per-batch device memory in a real deployment).

The model forward pass itself is STUBBED with a deterministic
md5-projection encoder (this container has no ML runtime — same policy
as the multimodal codecs): component j of doc t is

    (int(md5(md5(t) + ':' + j)[:8], 16) % 2000001 - 1000000) / 1e6

cast to float32 — reproducible in DuckDB ('0x' || hex-prefix cast), so
unlike a real model the stub is ORACLE-CHECKABLE end-to-end: the
registered query explodes (doc_id, dim, val) and hash-matches the SQL
twin bit for bit. Swapping in a real encoder = replacing ``_encode_row``
with a model call; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

EMBED_DIM = 16


def _encode_row(text: str, dim: int) -> list[float]:
    h1 = hashlib.md5((text or "").encode()).hexdigest()
    out = []
    for j in range(dim):
        hj = hashlib.md5(f"{h1}:{j}".encode()).hexdigest()[:8]
        out.append(
            np.float32((int(hj, 16) % 2000001 - 1000000) / 1e6)
        )
    return out


def embed_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """(id, embedding array<float>) — the batch-inference operator.

    Map-only by construction: each Arrow batch is encoded in place where
    the scan put it; at 100 TB the stage scales with input splits and
    the only tuning is records-per-batch (device memory) and executor
    count. Output feeds the ANN/dedup family unchanged.
    """

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "embedding": [
                        _encode_row(t, dim) for t in pdf[text_col]
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        encode, f"{id_col} long, embedding array<float>"
    )
