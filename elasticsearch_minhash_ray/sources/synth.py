"""Deterministic synthetic corpora (FIXTURES.md) — no external data.

- :func:`golden_corpus` — F-GOLD: the reference test's 1000-doc corpus
  (MinHashPluginTest.java:152-158: ``msg = "test " + i % 100``).
- :func:`code_corpus` — F-CODE: ~2k-row source-code corpus with exact-dup
  families, near-dup families at known token-edit rates, one giant
  boilerplate family (LSH-skew driver), and distinct singletons.

Both return a ``pyarrow.Table`` in the canonical corpus schema; everything is
seeded (default 42) and reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LANGS = ["py", "java", "js", "go"]

_KEYWORDS = {
    "py": ["def", "return", "if", "else", "for", "in", "import", "class", "self", "None"],
    "java": ["public", "static", "void", "class", "return", "new", "int", "String", "final", "null"],
    "js": ["function", "const", "let", "return", "if", "else", "var", "new", "null", "=>"],
    "go": ["func", "return", "if", "else", "for", "range", "var", "type", "struct", "nil"],
}

_LICENSE = """// Licensed under the Apache License, Version 2.0 (the "License");
// you may not use this file except in compliance with the License.
// You may obtain a copy of the License at http://www.apache.org/licenses/LICENSE-2.0
// Unless required by applicable law or agreed to in writing, software
// distributed under the License is distributed on an AS IS BASIS,
// WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied."""


def golden_corpus() -> pa.Table:
    """F-GOLD: 1000 rows, content = 'test ' + str(i % 100), i in 1..1000."""
    rows = {
        "repo": ["golden"] * 1000,
        "path": [f"doc/{i}.txt" for i in range(1, 1001)],
        "commit": ["v1"] * 1000,
        "lang": ["text"] * 1000,
        "content": [f"test {i % 100}" for i in range(1, 1001)],
    }
    return pa.table(rows)


def _gen_file(rng: np.random.Generator, lang: str, n_lines: int, vocab: list[str]) -> list[str]:
    """One synthetic source file as a list of lines (token-joined)."""
    kw = _KEYWORDS[lang]
    lines = []
    for _ in range(n_lines):
        n = int(rng.integers(3, 10))
        toks = []
        for _ in range(n):
            r = rng.random()
            if r < 0.3:
                toks.append(kw[int(rng.integers(0, len(kw)))])
            elif r < 0.85:
                toks.append(vocab[int(rng.integers(0, len(vocab)))])
            else:
                toks.append(str(int(rng.integers(0, 1000))))
        lines.append(" ".join(toks))
    return lines


def _mutate(rng: np.random.Generator, lines: list[str], edit_rate: float, vocab: list[str]) -> list[str]:
    """Token-level edits at ~edit_rate: substitute / delete / insert tokens."""
    out = []
    for line in lines:
        toks = line.split()
        new = []
        for t in toks:
            r = rng.random()
            if r < edit_rate / 2:
                new.append(vocab[int(rng.integers(0, len(vocab)))])  # substitute
            elif r < edit_rate * 0.75:
                pass  # delete
            else:
                new.append(t)
                if rng.random() < edit_rate / 4:
                    new.append(vocab[int(rng.integers(0, len(vocab)))])  # insert
        if new:
            out.append(" ".join(new))
    return out


def code_corpus(seed: int = 42) -> pa.Table:
    """F-CODE: ~2000 rows across ~40 repos. Families:
    - ~50 exact-dup families x 4 copies (200 rows)
    - ~100 near-dup families x ~6 members at 1-10% token-edit rate (600 rows)
    - 1 giant boilerplate family of ~300 near-identical license/config files
    - ~900 distinct singletons
    """
    rng = np.random.default_rng(seed)
    vocab = [f"sym_{i}" for i in range(4000)] + [f"val{i}" for i in range(500)]
    repos = [f"org{i % 8}/repo{i}" for i in range(40)]
    rows: list[tuple[str, str, str, str, str, int]] = []  # +truth family id

    def add(content: str, fam: int, idx: int, kind: str):
        lang = _LANGS[int(rng.integers(0, 4))]
        repo = repos[int(rng.integers(0, len(repos)))]
        rows.append(
            (repo, f"src/{kind}/{fam}_{idx}.{lang}", f"c{int(rng.integers(0, 5))}", lang, content, fam)
        )

    fam = 0
    # exact dups
    for _ in range(50):
        base = "\n".join(_gen_file(rng, "py", int(rng.integers(20, 60)), vocab))
        for j in range(4):
            add(base, fam, j, "exact")
        fam += 1
    # near dups
    for _ in range(100):
        lang = _LANGS[int(rng.integers(0, 4))]
        lines = _gen_file(rng, lang, int(rng.integers(30, 80)), vocab)
        add("\n".join(lines), fam, 0, "near")
        n_members = int(rng.integers(4, 8))
        for j in range(1, n_members):
            rate = float(rng.uniform(0.01, 0.10))
            add("\n".join(_mutate(rng, lines, rate, vocab)), fam, j, "near")
        fam += 1
    # giant boilerplate family (near-identical license headers + tiny config)
    for j in range(300):
        cfg_line = f"project = proj_{int(rng.integers(0, 20))}\nversion = 1.0.{int(rng.integers(0, 5))}"
        add(_LICENSE + "\n" + cfg_line, fam, j, "boiler")
    fam += 1
    # distinct singletons
    for _ in range(900):
        lang = _LANGS[int(rng.integers(0, 4))]
        add("\n".join(_gen_file(rng, lang, int(rng.integers(10, 50)), vocab)), fam, 0, "uniq")
        fam += 1

    cols = list(zip(*rows))
    return pa.table(
        {
            "repo": pa.array(cols[0], pa.string()),
            "path": pa.array(cols[1], pa.string()),
            "commit": pa.array(cols[2], pa.string()),
            "lang": pa.array(cols[3], pa.string()),
            "content": pa.array(cols[4], pa.string()),
            "truth_family": pa.array(cols[5], pa.int64()),
        }
    )


def write_corpus(table: pa.Table, path: str) -> str:
    import pyarrow.parquet as pq

    pq.write_table(table, path)
    return path


# ---------------------------------------------------------------------------
# bench-scale corpus (vectorized generation, parallel via Ray)
# ---------------------------------------------------------------------------

_BENCH_VOCAB_SIZE = 20_000


def bench_corpus_batch(batch: pa.Table, seed: int, tokens_per_doc: int, dup_frac: float) -> pa.Table:
    """Generate one block of the bench corpus from a range-Dataset ``id`` batch.

    Deterministic per doc index (rng seeded by ``seed ^ block-start``); a
    ``dup_frac`` fraction of docs are near-duplicates of a "base" doc family
    (doc i duplicates family i // 8 with a few token substitutions), the rest
    are i.i.d. token soup — enough structure to exercise LSH + verify +
    clustering at bench scale without planted-skew pathologies."""
    ids = batch["id"].to_numpy()
    n = len(ids)
    kw = _KEYWORDS["py"] + _KEYWORDS["java"]
    vocab = np.array(
        [f"sym_{i}" for i in range(_BENCH_VOCAB_SIZE)] + kw, dtype=object
    )
    is_dup = (ids % 1000) < int(dup_frac * 1000)
    # family base streams are regenerated deterministically from family id;
    # every doc is seeded by its own id so output is independent of batching
    fam = ids // 8
    contents = []
    for i in range(n):
        if is_dup[i]:
            frng = np.random.default_rng(seed ^ (1 << 40) ^ int(fam[i]))
            toks = vocab[frng.integers(0, len(vocab), tokens_per_doc)]
            # ~2% token substitutions unique to this member
            mrng = np.random.default_rng(seed ^ (1 << 41) ^ int(ids[i]))
            nmut = max(1, tokens_per_doc // 50)
            pos = mrng.integers(0, tokens_per_doc, nmut)
            toks = toks.copy()
            toks[pos] = vocab[mrng.integers(0, len(vocab), nmut)]
        else:
            drng = np.random.default_rng(seed ^ (1 << 42) ^ int(ids[i]))
            toks = vocab[drng.integers(0, len(vocab), tokens_per_doc)]
        contents.append(" ".join(toks))
    return pa.table(
        {
            "repo": pa.array([f"org{int(x) % 64}/repo{int(x) % 512}" for x in ids], pa.string()),
            "path": pa.array([f"src/f{int(x)}.py" for x in ids], pa.string()),
            "commit": pa.array(["c0"] * n, pa.string()),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def make_bench_corpus(
    path: str,
    n_docs: int,
    seed: int = 42,
    tokens_per_doc: int = 200,
    dup_frac: float = 0.2,
    num_blocks: int = 64,
) -> str:
    """Materialize the deterministic bench corpus to parquet (idempotent:
    skipped when the directory already has a _SUCCESS marker for the params)."""
    import json
    import os

    import ray.data as rd

    key = json.dumps([n_docs, seed, tokens_per_doc, dup_frac], sort_keys=True)
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker) and open(marker).read() == key:
        return path
    os.makedirs(path, exist_ok=True)
    ds = rd.range(n_docs, override_num_blocks=num_blocks).map_batches(
        lambda b, s=seed, t=tokens_per_doc, d=dup_frac: bench_corpus_batch(b, s, t, d),
        batch_format="pyarrow",
    )
    ds.write_parquet(path)
    with open(marker, "w") as f:
        f.write(key)
    return path
