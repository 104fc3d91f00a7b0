"""Deterministic on-disk artifacts for the correctness gate.

The driver compares each Spark query against a DuckDB oracle SQL. For
KG queries both engines need a common input: we materialize

* ``corpus.parquet``  — the synthetic input table (pure Python),
* ``triples.parquet`` — the *sequential* pure-Python parse of that
  corpus (the same ``DocumentParser`` the Spark UDF runs),
* ``errors.parquet``  — its error rows.

The Spark side of every KG query re-runs the real distributed pipeline
from ``corpus.parquet``; the oracle reads ``triples.parquet``. A match
therefore proves distributed == sequential (partitioning invariance,
lineage, determinism) for the whole pipeline, on top of the per-operator
SQL parity. Parser *semantics* are covered separately by
tests/test_parser_semantics.py against the reference's assertions.

Artifacts are versioned: bump ``_VERSION`` when parser output or corpus
generation changes.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.udfs import parse_rows_to_records
from .corpus import corpus_rows, write_corpus_parquet
from .fixtures import build_default_import_map

_VERSION = 3
ARTIFACT_DIR = os.environ.get(
    "YPO_ARTIFACT_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".artifacts", "kg"),
)

CORPUS_PARAMS = dict(n_forks=8, noise=True, giant_repo_fraction=0.5, seed=42)

_TRIPLE_COLS = [
    "subj",
    "pred",
    "obj",
    "obj_is_literal",
    "obj_datatype",
    "doc_iri",
    "src_repo",
    "src_path",
    "src_commit",
    "src_sha256",
]
_ERROR_COLS = ["src_repo", "src_path", "src_commit", "src_sha256", "stage", "message"]


def corpus_path() -> str:
    return os.path.join(ARTIFACT_DIR, "corpus.parquet")


def triples_path() -> str:
    return os.path.join(ARTIFACT_DIR, "triples.parquet")


def errors_path() -> str:
    return os.path.join(ARTIFACT_DIR, "errors.parquet")


def _marker_path() -> str:
    return os.path.join(ARTIFACT_DIR, "MANIFEST.json")


def ensure_artifacts() -> dict:
    """Build artifacts if missing/stale. Pure Python — no SparkSession."""
    from .fixtures import reference_available

    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    # reference availability is part of the cache key: artifacts built
    # from the demo fallback must not be reused once /root/reference
    # appears (and vice versa)
    manifest = {
        "version": _VERSION,
        "params": CORPUS_PARAMS,
        "reference": reference_available(),
    }
    try:
        with open(_marker_path()) as fh:
            if json.load(fh) == manifest and all(
                os.path.exists(p) for p in (corpus_path(), triples_path(), errors_path())
            ):
                return {"corpus": corpus_path(), "triples": triples_path(), "errors": errors_path()}
    except Exception:
        pass

    n = write_corpus_parquet(corpus_path(), **CORPUS_PARAMS)

    rows = [
        r
        for r in corpus_rows(**CORPUS_PARAMS)
        if r[3] == "yaml" and r[1].endswith(".owl.yml")
    ]
    records = parse_rows_to_records(
        [r[0] for r in rows],
        [r[1] for r in rows],
        [r[2] for r in rows],
        [r[4] for r in rows],
        build_default_import_map(),
    )
    triples = [r[1:11] for r in records if r[0] == "t"]
    errors = [tuple(r[7:11]) + tuple(r[11:13]) for r in records if r[0] == "e"]

    t_cols = list(zip(*triples)) if triples else [[] for _ in _TRIPLE_COLS]
    pq.write_table(
        pa.table(
            {
                name: pa.array(list(col), type=pa.bool_() if name == "obj_is_literal" else pa.string())
                for name, col in zip(_TRIPLE_COLS, t_cols)
            }
        ),
        triples_path(),
    )
    e_cols = list(zip(*errors)) if errors else [[] for _ in _ERROR_COLS]
    pq.write_table(
        pa.table({name: pa.array(list(col), type=pa.string()) for name, col in zip(_ERROR_COLS, e_cols)}),
        errors_path(),
    )

    with open(_marker_path(), "w") as fh:
        json.dump(manifest, fh)
    return {"corpus": corpus_path(), "triples": triples_path(), "errors": errors_path(), "n_corpus_rows": n}
