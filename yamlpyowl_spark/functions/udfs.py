"""Arrow-batched parse stage.

One ``mapInArrow`` stage turns batches of source rows into batches of
triple/error rows. YAML-ontology semantics are inherently sequential
*per document* (SURVEY.md §1.4), so the document is the unit of work;
batching and the Python↔JVM crossing are Arrow-vectorized — the UDF
builds pyarrow RecordBatches column-wise (per-document constants are
extended with C-speed list ops), skipping pandas entirely in the hot
path. No per-row Python at the Spark plan level.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterator, List, Optional

import pyarrow as pa

from ..parser.document import DocumentParser, ParseError

_PARSED_COLUMNS = [
    "rec",
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
    "stage",
    "message",
]

_ARROW_TYPES = {c: pa.string() for c in _PARSED_COLUMNS}
_ARROW_TYPES["obj_is_literal"] = pa.bool_()
_ARROW_SCHEMA = pa.schema([(c, _ARROW_TYPES[c]) for c in _PARSED_COLUMNS])


def parse_rows_to_columns(
    repos, paths, commits, contents, import_map: Optional[dict]
) -> Dict[str, list]:
    """Parse a batch of documents into column lists (triples + errors).

    A document that fails anywhere produces exactly one error record and
    no triples (matching the reference's all-or-nothing observable
    behavior per document).
    """
    cols: Dict[str, list] = {c: [] for c in _PARSED_COLUMNS}
    for repo, path, commit, content in zip(repos, paths, commits, contents):
        sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
        try:
            result = DocumentParser(content, import_map=import_map).parse()
        except ParseError as err:
            stage = "yaml_load" if str(err).startswith("yaml_load") else "parse"
            _append_error(cols, repo, path, commit, sha, stage, str(err)[:2000])
            continue
        except Exception as err:  # never kill an executor on a poison doc
            _append_error(cols, repo, path, commit, sha, "internal", str(err)[:2000])
            continue
        n = len(result.triples)
        if n == 0:
            continue
        s, p, o, lit, dt = zip(*result.triples)
        cols["rec"].extend(["t"] * n)
        cols["subj"].extend(s)
        cols["pred"].extend(p)
        cols["obj"].extend(o)
        cols["obj_is_literal"].extend(lit)
        cols["obj_datatype"].extend(dt)
        cols["doc_iri"].extend([result.iri] * n)
        cols["src_repo"].extend([repo] * n)
        cols["src_path"].extend([path] * n)
        cols["src_commit"].extend([commit] * n)
        cols["src_sha256"].extend([sha] * n)
        cols["stage"].extend([None] * n)
        cols["message"].extend([None] * n)
    return cols


def _append_error(cols, repo, path, commit, sha, stage, message):
    for c, v in (
        ("rec", "e"),
        ("subj", None),
        ("pred", None),
        ("obj", None),
        ("obj_is_literal", None),
        ("obj_datatype", None),
        ("doc_iri", None),
        ("src_repo", repo),
        ("src_path", path),
        ("src_commit", commit),
        ("src_sha256", sha),
        ("stage", stage),
        ("message", message),
    ):
        cols[c].append(v)


def parse_rows_to_records(
    repos, paths, commits, contents, import_map: Optional[dict]
) -> List[tuple]:
    """Row-tuple view of :func:`parse_rows_to_columns` (used by the
    artifact builder and equality tests)."""
    cols = parse_rows_to_columns(repos, paths, commits, contents, import_map)
    return list(zip(*(cols[c] for c in _PARSED_COLUMNS)))


def make_parse_udf(import_map: Optional[dict], emit_metrics: bool = False):
    """Build the mapInArrow function. ``import_map`` is a small plain
    dict captured in the closure — shipped once per task with the
    serialized function.

    With ``emit_metrics=True`` each task appends one ``rec='m'`` record
    carrying per-partition lineage/metrics as JSON (partition id, doc &
    triple & error counts, wall ms) — the UDF wraps the whole partition
    iterator, so it times itself with no extra pass."""

    def parse_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import json
        import time

        t0 = time.time()
        n_docs = n_triples = n_errors = 0
        for batch in batches:
            cols = parse_rows_to_columns(
                batch.column("repo").to_pylist(),
                batch.column("path").to_pylist(),
                batch.column("commit").to_pylist(),
                batch.column("content").to_pylist(),
                import_map,
            )
            if emit_metrics:
                n_docs += batch.num_rows
                n_errors += sum(1 for r in cols["rec"] if r == "e")
                n_triples += len(cols["rec"]) - sum(1 for r in cols["rec"] if r == "e")
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[c], type=_ARROW_TYPES[c]) for c in _PARSED_COLUMNS],
                schema=_ARROW_SCHEMA,
            )
        if emit_metrics:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            payload = json.dumps(
                {
                    "partition_id": ctx.partitionId() if ctx else -1,
                    "n_docs": n_docs,
                    "n_triples": n_triples,
                    "n_errors": n_errors,
                    "wall_ms": int((time.time() - t0) * 1000),
                }
            )
            mcols = {c: [None] for c in _PARSED_COLUMNS}
            mcols["rec"] = ["m"]
            mcols["stage"] = ["metrics"]
            mcols["message"] = [payload]
            mcols["src_repo"] = [""]
            mcols["src_path"] = [""]
            mcols["src_commit"] = [""]
            mcols["src_sha256"] = [""]
            yield pa.RecordBatch.from_arrays(
                [pa.array(mcols[c], type=_ARROW_TYPES[c]) for c in _PARSED_COLUMNS],
                schema=_ARROW_SCHEMA,
            )

    return parse_batches
