"""Arrow-batched parse stage.

One ``mapInPandas`` stage turns batches of source rows into batches of
triple/error rows. YAML-ontology semantics are inherently sequential
*per document* (SURVEY.md §1.4), so the document is the unit of work;
batching and the Python↔JVM crossing are Arrow-vectorized. No per-row
Python at the Spark plan level: the plan contains exactly one
MapInPandas operator for the whole parse.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Optional

import pandas as pd

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


def parse_rows_to_records(
    repos, paths, commits, contents, import_map: Optional[dict]
) -> List[tuple]:
    """Parse a batch of documents; returns combined triple+error records.

    A document that fails anywhere produces exactly one error record and
    no triples (matching the reference's all-or-nothing observable
    behavior per document).
    """
    out: List[tuple] = []
    for repo, path, commit, content in zip(repos, paths, commits, contents):
        sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
        try:
            result = DocumentParser(content, import_map=import_map).parse()
        except ParseError as err:
            stage = "yaml_load" if str(err).startswith("yaml_load") else "parse"
            out.append(
                ("e", None, None, None, None, None, None, repo, path, commit, sha, stage, str(err)[:2000])
            )
            continue
        except Exception as err:  # never kill an executor on a poison doc
            out.append(
                ("e", None, None, None, None, None, None, repo, path, commit, sha, "internal", str(err)[:2000])
            )
            continue
        for (s, p, o, lit, dt) in result.triples:
            out.append(("t", s, p, o, lit, dt, result.iri, repo, path, commit, sha, None, None))
    return out


def make_parse_udf(import_map: Optional[dict]):
    """Build the mapInPandas function. ``import_map`` is a small plain
    dict captured in the closure — Spark ships it once per task via the
    serialized function (broadcast-equivalent for this size)."""

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            records = parse_rows_to_records(
                pdf["repo"].tolist(),
                pdf["path"].tolist(),
                pdf["commit"].tolist(),
                pdf["content"].tolist(),
                import_map,
            )
            yield pd.DataFrame.from_records(records, columns=_PARSED_COLUMNS)

    return parse_batches
