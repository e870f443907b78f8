"""Custom stateful streaming operator: exact first-seen dedup.

``applyInPandasWithState`` keyed by content sha256 — the engine-managed
state store holds one marker per content hash, so each distinct content is
emitted exactly once across the life of the stream (late or re-ingested
copies are dropped by state, not by re-reading an external table the way
``StreamingDeduper`` does for near-dup bands).

Scale shape: state is partitioned by the grouping key across executors, the
per-key payload is a single int, and the operator sees each micro-batch
group as an iterator of Arrow batches — nothing is collected.  With
checkpointing the state store survives restarts, which is what makes the
operator exactly-once across job lifetimes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "content_sha string, repo string, path string, commit string, "
    "lang string, content string"
)
STATE_SCHEMA = "seen int"


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # content already emitted in an earlier micro-batch: drop everything
        for _ in pdfs:
            pass
        return
    emitted = False
    for pdf in pdfs:
        if not emitted and len(pdf):
            first = pdf.iloc[:1][
                ["content_sha", "repo", "path", "commit", "lang", "content"]
            ]
            emitted = True
            yield first
    if emitted:
        state.update((1,))


def dedup_first_seen(files: DataFrame) -> DataFrame:
    """Streaming files -> stream of first-seen rows per distinct content.

    Input columns: (repo, path, commit, lang, content); output adds
    content_sha and keeps only the first row ever seen for each sha.
    """
    keyed = files.withColumn("content_sha", F.sha2("content", 256)).groupBy(
        "content_sha"
    )
    return keyed.applyInPandasWithState(
        _first_seen,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
