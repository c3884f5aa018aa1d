"""Text-analysis queries over the ``documents`` table (training-data ops).

Actor-pool stages (``map_batches(Cls, concurrency=2)``) — state (stopword
sets, language profiles, compiled regexes) is built once per actor.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from radiant_portal_pipeline_ray.stages.textstages import (
    FingerprintStage,
    LangIdStage,
    QualityScoreStage,
    TokenizeStage,
)

QUERIES: dict = {}


def _register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


_STOPLIST_SQL = (
    "['the','and','of','to','in','is','that','for','it','with','a','an','on',"
    "'at','as','by','be']"
)


@_register(
    "t_token_counts",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
                AS BIGINT) AS n_tokens_ws
    FROM documents ORDER BY doc_id
    """,
)
def t_token_counts(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        TokenizeStage(), batch_format="pyarrow", concurrency=2
    )
    return ds.select_columns(["doc_id", "n_tokens_ws"]).sort("doc_id")


@_register(
    "t_quality_scores",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_q,
           CAST(len(list_filter(string_split(trim(text), ' '), x -> x <> ''))
                AS BIGINT) AS n_words,
           CAST(len(list_filter(string_split(trim(text), ' '),
                x -> x <> '' AND list_contains({_STOPLIST_SQL}, lower(x))))
                AS BIGINT) AS n_stopwords
    FROM documents ORDER BY doc_id
    """,
)
def t_quality_scores(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScoreStage(), batch_format="pyarrow", concurrency=2
    )
    return ds.select_columns(["doc_id", "n_chars_q", "n_words", "n_stopwords"]).sort(
        "doc_id"
    )


@_register("t_lang_id", None)  # heuristic classifier — rows-only check
def t_lang_id(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        LangIdStage(), batch_format="pyarrow", concurrency=2
    )
    return ds.select_columns(["doc_id", "lang", "lang_pred"]).sort("doc_id")


@_register("t_fingerprints", None)  # custom rolling hash — rows-only check
def t_fingerprints(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        FingerprintStage(), batch_format="pyarrow", concurrency=2
    )
    return ds.select_columns(["doc_id", "fingerprint"]).sort("doc_id")
