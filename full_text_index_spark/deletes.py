"""Logical document deletion (tombstones) + physical compaction.

The reference collection is a strictly STATIC self-index (build once,
query forever — utils/interface.h has no delete); incremental APPEND
already exists here (streaming.append_generation).  Tombstones complete
the lifecycle with the semantics every production FTS engine (Lucene
soft-deletes) uses:

- ``delete_docs`` records doc_ids in ``<index>/tombstones`` (parquet).
  Idempotent: re-deleting is a no-op; the stored set is distinct.
- **Every doc-level query result excludes deleted docs immediately**:
  ranked retrieval (BM25 incl. the MaxScore kernel, which masks at its
  single decode choke point so deleted docs never enter any scoring
  path), locate/positions, boolean/phrase/NEAR, substring/regex/approx/
  ci locate — each masks against the tombstone set.
- **Dictionary statistics stay physical until compaction**: df/cf/idf,
  short-gram stats and index_size keep counting tombstoned postings
  until ``compact`` rebuilds — exactly Lucene's deferred-merge contract.
  Scores therefore use the PHYSICAL idf/avgdl (documented, deterministic,
  and what real engines do between merges).
- ``compact`` rebuilds the index from the surviving docs into a fresh
  root (no tombstones table afterwards) — the merge that reclaims space
  and refreshes statistics.

The tombstone set is driver-bounded (MAX_TOMBSTONES) because the BM25
kernel carries it as closure state next to the query batch; the exact
(non-blockmax) path and all join-based masks are fully distributed and
carry no such bound — at larger delete volumes, compact.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_text_index_spark.index import InvertedIndex

MAX_TOMBSTONES = 2_000_000


def tombstones_path(root: str) -> str:
    return os.path.join(root, "tombstones")


def delete_docs(index: InvertedIndex, doc_ids) -> int:
    """Tombstone ``doc_ids`` (list[int] or a single-column DataFrame).
    Returns the total tombstone count after the merge.  The stored set is
    distinct, so replays/overlapping deletes are idempotent."""
    spark = index.spark
    if isinstance(doc_ids, DataFrame):
        new = doc_ids.select(
            F.col(doc_ids.columns[0]).cast("long").alias("doc_id")
        ).toPandas()["doc_id"].to_numpy(dtype=np.int64)
    else:
        new = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    cur = read_tombstone_ids(spark, index.paths.root)
    merged = (np.unique(np.concatenate([cur, new]))
              if cur is not None else np.unique(new))
    if len(merged) > MAX_TOMBSTONES:
        raise ValueError(
            f"{len(merged)} tombstones exceeds MAX_TOMBSTONES "
            f"({MAX_TOMBSTONES}) — the BM25 kernel carries the set as "
            "closure state; compact() the index instead"
        )
    (
        spark.createDataFrame([(int(d),) for d in merged], "doc_id long")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tombstones_path(index.paths.root))
    )
    index._deleted_ids_cache = merged
    return len(merged)


def read_tombstone_ids(spark: SparkSession, root: str) -> np.ndarray | None:
    """Sorted int64 tombstone ids, or None when the index has none."""
    path = tombstones_path(root)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        return None
    ids = (
        spark.read.parquet(path).toPandas()["doc_id"]
        .to_numpy(dtype=np.int64)
    )
    return np.unique(ids)


def deleted_ids(index: InvertedIndex) -> np.ndarray | None:
    """Instance-cached tombstone set (None = nothing deleted)."""
    cached = getattr(index, "_deleted_ids_cache", False)
    if cached is False:
        cached = read_tombstone_ids(index.spark, index.paths.root)
        index._deleted_ids_cache = cached
    return cached


def mask_deleted(index: InvertedIndex, df: DataFrame,
                 col: str = "doc_id") -> DataFrame:
    """Drop rows whose ``col`` is tombstoned — a no-op (identical plan)
    when the index has no tombstones; a broadcast LEFT ANTI join
    otherwise (fully distributed, no size coupling to ``df``)."""
    ids = deleted_ids(index)
    if ids is None or len(ids) == 0:
        return df
    tdf = index.spark.createDataFrame(
        [(int(d),) for d in ids], "t_doc_id long"
    )
    return df.join(
        F.broadcast(tdf), df[col] == tdf["t_doc_id"], "left_anti"
    )


def compact(index: InvertedIndex, docs: DataFrame, new_root: str,
            **build_kwargs) -> InvertedIndex:
    """Physical merge: rebuild the index at ``new_root`` from the
    surviving documents (same unit/k/positions as the source — taken
    from its meta unless overridden), with no tombstones table.  ``docs``
    must be the corpus the source index was built from (the cached roots
    deliberately do not duplicate the text)."""
    from full_text_index_spark.build import build_index
    from full_text_index_spark.substring import build_gram_index

    survivors = mask_deleted(index, docs)
    meta = index.meta
    unit = meta.get("unit", "token")
    kwargs = {
        "n_segments": meta["n_segments"],
        "block_size": meta["block_size"],
    }
    if unit.startswith("chargram-"):
        kwargs["k"] = int(unit.split("-", 1)[1])
        kwargs.update(build_kwargs)
        build_gram_index(index.spark, survivors, new_root, **kwargs)
    else:
        kwargs["positions"] = bool(meta.get("positions"))
        kwargs.update(build_kwargs)
        build_index(index.spark, survivors, new_root, **kwargs)
    return InvertedIndex.open(index.spark, new_root)
