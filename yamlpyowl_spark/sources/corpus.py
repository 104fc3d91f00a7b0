"""Deterministic synthetic source-code corpus.

Synthesizes the pipeline's input table
``(repo, path, commit, lang, content)`` (BASELINE.json ``input_hint``)
at small scale for tests/benchmarks — no external data:

* one canonical row per reference fixture document;
* fork rows: the same documents replicated across K repos with a
  repo-specific ontology IRI spliced in (so cross-document entity
  linking has real work to do);
* noise rows (non-YAML langs, non-ontology YAML, one malformed
  ``.owl.yml``) that the scan filter / error channel must handle;
* optional skew: a configurable fraction of rows lands in one giant
  "monorepo" (exercises salted repartitioning).

Everything is seeded; ``commit`` ids are content-derived. The generator
is pure Python so artifacts can be built without a SparkSession.
"""

from __future__ import annotations

import hashlib
import random
import re
from typing import Dict, Iterator, List, Tuple

from .fixtures import FIXTURE_SPECS, load_fixture_texts

Row = Tuple[str, str, str, str, str]  # repo, path, commit, lang, content

_IRI_RE = re.compile(r"^- iri:\s*[\"']?([^\"'\s]+)[\"']?\s*$", re.MULTILINE)

GIANT_REPO = "megacorp/monorepo"


def _commit_of(repo: str, path: str, content: str, seed: int) -> str:
    h = hashlib.sha1(f"{seed}:{repo}:{path}:{len(content)}".encode()).hexdigest()
    return h[:40]


def _fork_content(content: str, fork_iri: str) -> str:
    m = _IRI_RE.search(content)
    if not m:
        return content
    return content.replace(m.group(1), fork_iri)


def _noise_rows(seed: int) -> List[Row]:
    rng = random.Random(seed + 17)
    rows: List[Row] = []
    langs = ["python", "markdown", "json"]
    for i in range(20):
        lang = langs[i % len(langs)]
        ext = {"python": "py", "markdown": "md", "json": "json"}[lang]
        body = " ".join(f"tok{rng.randint(0, 999)}" for _ in range(rng.randint(20, 120)))
        repo = f"noise/repo{i % 5}"
        path = f"src/file_{i}.{ext}"
        rows.append((repo, path, _commit_of(repo, path, body, seed), lang, body))
    # yaml, but not ontology documents (filtered out by the scan predicate)
    ci = "stages:\n  - test\ntest:\n  script:\n    - python -m pytest -x -q\n"
    rows.append(("noise/ci", ".gitlab-ci.yml", _commit_of("noise/ci", ".gitlab-ci.yml", ci, seed), "yaml", ci))
    cfg = "server:\n  port: 8080\n  host: 0.0.0.0\n"
    rows.append(("noise/cfg", "config/app.yml", _commit_of("noise/cfg", "config/app.yml", cfg, seed), "yaml", cfg))
    # malformed ontology document → must become an error row, not a crash
    bad = "- iri: https://example.org/broken#\n- owl_class:\n    A:\n      SubClassOf: [unclosed\n"
    rows.append(
        ("noise/broken", "ontologies/broken.owl.yml", _commit_of("noise/broken", "ontologies/broken.owl.yml", bad, seed), "yaml", bad)
    )
    # ontology doc referencing an unknown name → semantic error row
    sem = "- iri: https://example.org/sem#\n- owl_individual:\n    foo:\n      types:\n        - NoSuchClass\n"
    rows.append(
        ("noise/sem", "ontologies/sem.owl.yml", _commit_of("noise/sem", "ontologies/sem.owl.yml", sem, seed), "yaml", sem)
    )
    return rows


def iter_corpus_rows(
    n_forks: int = 8,
    noise: bool = True,
    giant_repo_fraction: float = 0.5,
    seed: int = 42,
    fixture_texts: Dict[str, str] | None = None,
) -> Iterator[Row]:
    """Yield corpus rows deterministically.

    ``n_forks`` fork copies are generated per fixture document;
    ``giant_repo_fraction`` of them goes into one giant monorepo to
    force skew handling.
    """
    texts = fixture_texts if fixture_texts is not None else load_fixture_texts()
    canonical_repos = {path: repo for (repo, path, _ref) in FIXTURE_SPECS}

    for path, content in sorted(texts.items()):
        repo = canonical_repos.get(path, "org/demo")
        yield (repo, path, _commit_of(repo, path, content, seed), "yaml", content)

    n_giant = int(n_forks * giant_repo_fraction)
    for path, content in sorted(texts.items()):
        stem = path.rsplit("/", 1)[-1]
        for k in range(n_forks):
            if k < n_giant:
                repo = GIANT_REPO
                fpath = f"vendored/{stem.removesuffix('.owl.yml')}/{k}/{stem}"
            else:
                repo = f"forks/{stem.removesuffix('.owl.yml')}-{k}"
                fpath = f"ontologies/{stem}"
            fork_iri = f"https://w3id.org/forks/{stem.removesuffix('.owl.yml')}/{k}#"
            fcontent = _fork_content(content, fork_iri)
            yield (repo, fpath, _commit_of(repo, fpath, fcontent, seed), "yaml", fcontent)

    if noise:
        yield from _noise_rows(seed)


def corpus_rows(**kw) -> List[Row]:
    return list(iter_corpus_rows(**kw))


def write_corpus_parquet(out_path: str, row_group_size: int = 256, **kw) -> int:
    """Write the corpus with pyarrow (no SparkSession needed). Returns
    row count. Small row groups keep the file splittable — a single
    giant row group would serialize the Spark scan into one task."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = corpus_rows(**kw)
    cols = list(zip(*rows))
    table = pa.table(
        {
            "repo": list(cols[0]),
            "path": list(cols[1]),
            "commit": list(cols[2]),
            "lang": list(cols[3]),
            "content": list(cols[4]),
        }
    )
    pq.write_table(table, out_path, row_group_size=row_group_size)
    return len(rows)


def corpus_df(spark, **kw):
    from ..schema import SOURCE_SCHEMA, arrow_local_df

    # Arrow path (pandas → LocalTableScan): the tuple-list
    # createDataFrame plans as a pickled Python RDD that re-ships the
    # whole corpus through a Python worker pass on every action that
    # reads it (r7; ~50 MB for the 25k-doc bench corpus)
    return arrow_local_df(spark, list(corpus_rows(**kw)), SOURCE_SCHEMA)
