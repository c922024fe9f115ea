"""Deterministic test corpora (FIXTURES.md) — synthesized in-repo, no external
data.

Corpus A mirrors the reference's golden test corpus exactly
(MinHashPluginTest.java:152-158): 1000 rows, content "test "+(i%100) -> 100
clusters of 10. Corpus B plants near-duplicate pseudo-source clusters with
bounded edits plus a universal license header (the LSH bucket-skew stressor).
"""

from __future__ import annotations

import hashlib
import random

LANGS = ["java", "py", "js", "go", "txt"]

LICENSE_HEADER = "\n".join(
    [
        "/*",
        " * Licensed to the Example Software Foundation (ESF) under one",
        " * or more contributor license agreements.  See the NOTICE file",
        " * distributed with this work for additional information",
        " * regarding copyright ownership.  The ESF licenses this file",
        " * to you under the Example License, Version 2.0 (the",
        ' * "License"); you may not use this file except in compliance',
        " * with the License.  You may obtain a copy of the License at",
        " *   http://www.example.org/licenses/LICENSE-2.0",
        " * Unless required by applicable law or agreed to in writing,",
        ' * software distributed under the License is distributed "AS IS".',
        " */",
    ]
)


def file_id(repo: str, path: str, commit: str) -> str:
    """Must equal F.sha2(concat_ws('', repo, path, commit), 256)."""
    return hashlib.sha256((repo + path + commit).encode()).hexdigest()


def corpus_a() -> list[dict]:
    """Reference fixture corpus: row i (1-based) content 'test '+(i%100)."""
    rows = []
    for i in range(1, 1001):
        rows.append(
            {
                "repo": "fixture/es-minhash",
                "path": f"doc/{i}.txt",
                "commit": "0" * 40,
                "lang": "txt",
                "content": f"test {i % 100}",
            }
        )
    return rows


# ---------------------------------------------------------------------------
# corpus B — planted near-duplicate pseudo-source files
# ---------------------------------------------------------------------------

_KEYWORDS = {
    "java": ["public", "static", "void", "class", "return", "new", "int", "final"],
    "py": ["def", "class", "return", "import", "self", "for", "in", "if"],
    "js": ["function", "const", "let", "return", "export", "class", "async", "await"],
    "go": ["func", "type", "struct", "return", "package", "import", "var", "range"],
    "txt": ["the", "of", "and", "to", "in", "is", "for", "with"],
}


def _base_file(rng: random.Random, lang: str, idents: list[str]) -> list[str]:
    kw = _KEYWORDS[lang]
    n_lines = rng.randint(40, 220)
    lines = []
    for _ in range(n_lines):
        toks = [rng.choice(kw)] + rng.sample(idents, rng.randint(2, 5))
        indent = "    " * rng.randint(0, 3)
        lines.append(indent + " ".join(toks) + ("();" if lang in ("java", "js") else ""))
    return lines


def _mutate(rng: random.Random, lines: list[str], idents: list[str]) -> list[str]:
    """Bounded edits keeping char-shingle Jaccard high (>=~0.8)."""
    out = list(lines)
    kind = rng.randint(0, 3)
    if kind == 0:  # rename one identifier globally
        old = rng.choice(idents)
        new = old + "_v2"
        out = [ln.replace(old, new) for ln in out]
    elif kind == 1:  # insert <=2 lines
        for _ in range(rng.randint(1, 2)):
            pos = rng.randrange(len(out) + 1)
            toks = rng.sample(idents, 3)
            out.insert(pos, "    " + " ".join(toks))
    elif kind == 2:  # delete <=2 lines
        for _ in range(min(rng.randint(1, 2), len(out) - 5)):
            out.pop(rng.randrange(len(out)))
    else:  # swap two small blocks (function reorder)
        if len(out) > 12:
            i = rng.randrange(0, len(out) // 2 - 3)
            j = rng.randrange(len(out) // 2, len(out) - 3)
            out[i : i + 3], out[j : j + 3] = out[j : j + 3], out[i : i + 3]
    return out


def corpus_b(
    n_clusters: int = 200,
    n_singletons: int = 2000,
    seed: int = 42,
    max_cluster: int = 50,
) -> tuple[list[dict], list[tuple[str, str]], list[tuple[str, str]]]:
    """Returns (files, truth_pairs, truth_clusters).

    truth_pairs: (a_file_id, b_file_id), a < b, all intra-cluster pairs.
    truth_clusters: (file_id, cluster_id=min file_id of the cluster).
    Every file is prepended with the SAME 12-line license header (the LSH
    skew stressor mandated by FIXTURES.md §3).
    """
    rng = random.Random(seed)
    # zero-padded so no identifier is a prefix of another (global rename edits
    # must stay bounded)
    idents = [f"var_{i:02d}" for i in range(60)] + [f"fn_{i:02d}" for i in range(40)]
    files: list[dict] = []
    truth_pairs: list[tuple[str, str]] = []
    truth_clusters: list[tuple[str, str]] = []
    uid = 0

    def emit(content: str, cluster: list[str], lang: str):
        nonlocal uid
        repo = f"org{uid % 7}/repo{uid % 13}"
        path = f"src/pkg{uid % 11}/File{uid}.{lang}"
        commit = hashlib.sha1(str(uid).encode()).hexdigest()
        files.append(
            {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}
        )
        cluster.append(file_id(repo, path, commit))
        uid += 1

    for _c in range(n_clusters):
        lang = rng.choice(LANGS)
        base = _base_file(rng, lang, idents)
        # Zipf-ish cluster size in 1..max_cluster
        size = min(max_cluster, max(2, int(rng.paretovariate(1.6))))
        members: list[str] = []
        emit(LICENSE_HEADER + "\n" + "\n".join(base), members, lang)
        for _m in range(size - 1):
            mutated = _mutate(rng, base, idents)
            emit(LICENSE_HEADER + "\n" + "\n".join(mutated), members, lang)
        members.sort()
        cid = members[0]
        for fid in members:
            truth_clusters.append((fid, cid))
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                truth_pairs.append((members[i], members[j]))

    for _s in range(n_singletons):
        lang = rng.choice(LANGS)
        base = _base_file(rng, lang, idents)
        members = []
        emit(LICENSE_HEADER + "\n" + "\n".join(base), members, lang)
        truth_clusters.append((members[0], members[0]))

    return files, truth_pairs, truth_clusters
