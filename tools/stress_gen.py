"""Adversarial-skew fixture generator for the scale stress harness.

The plan-discipline sweep (tests/test_plan_discipline.py) proves every
query's SHAPE is scale-safe (no cross products, no row-Python, bounded
broadcasts); nothing there proves BEHAVIOR under hot keys at volume.
This tool synthesizes a sf0.1-sized corpus with the three classic
adversarial skews a crawl-scale pipeline actually meets:

- **hot domain**: one source owns 50% of the documents (the
  wikipedia.org slice of a crawl) — stresses per-domain windows/caps;
- **near-dup cluster**: 10% of documents are near-identical (one
  variable token each, so EXACT dedup cannot collapse them first) —
  stresses the LSH banding self-join with one giant candidate bucket;
- **hot embedding cell**: 80% of vectors huddle around one attractor
  (a template-image/boilerplate-text embedding cluster) — stresses
  cell-scoped pair joins and the semantic_dedup cell-size guard.

Everything is derived from md5 of (salt, index) — no RNG state, same
bytes on every run, so budgets measured against the fixture compare
across rounds. Schemas mirror /root/testdata exactly (documents:
doc_id/text/lang/source/n_chars; embeddings: vec_id/embedding/label).

Usage: python tools/stress_gen.py <out_dir> [n_docs] [n_vecs]
(defaults 5000 / 2000 — the sf0.1 row counts).
"""

from __future__ import annotations

import hashlib
import os
import sys

# the testdata's own word-salad vocabulary class: short tokens, no
# punctuation, so tokenizers/shinglers behave exactly as on testdata
_VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value",
    "part", "hash", "batch", "window", "spark", "order", "data",
    "column", "join", "small", "line", "customer", "query", "filter",
    "the", "a", "merge", "sort", "shuffle", "broadcast", "cache",
    "plan", "stage", "task", "skew", "bucket", "range", "index",
]


def _h(salt: str, i: int, j: int = 0) -> int:
    return int(hashlib.md5(f"{salt}|{i}|{j}".encode())
               .hexdigest()[:12], 16)


def _salad(i: int, n_words: int) -> str:
    return " ".join(_VOCAB[_h("w", i, j) % len(_VOCAB)]
                    for j in range(n_words))


def generate(out_dir: str, n_docs: int = 5000,
             n_vecs: int = 2000, dim: int = 64) -> dict:
    """Write documents.parquet + embeddings.parquet under ``out_dir``
    and return the skew layout (counts per skew class) for asserts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n_dup = n_docs // 10          # 10% near-dup cluster
    dup_base = _salad(10**9, 60)  # the cluster's shared 60-token body

    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for i in range(n_docs):
        if i % 10 == 3:
            # near-dup: shared body + ONE per-doc token, so exact
            # dedup keeps all of them and LSH must carry the cluster
            text = f"{dup_base} tail{i}"
        else:
            text = _salad(i, 20 + _h("len", i) % 60)
        # hot domain: every even doc -> the one hot source (50%)
        src = "hotsrc" if i % 2 == 0 else f"src{_h('s', i) % 19}"
        ids.append(i)
        texts.append(text)
        langs.append("en" if _h("lang", i) % 10 else "de")
        sources.append(src)
        n_chars.append(len(text))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), os.path.join(out_dir, "documents.parquet"))

    vec_ids, vecs, labels = [], [], []
    for i in range(n_vecs):
        hot = i % 5 != 4          # 80% in the attractor cell
        base = ([1000.0] + [0.0] * (dim - 1)) if hot else \
            [0.0] * dim
        v = list(base)
        for j in range(dim):
            # +-0.5-unit jitter: hot vectors stay cosine ~1-eps to
            # the attractor; cold vectors spread over the sphere
            jit = (_h("v", i, j) % 1001 - 500) / (1000.0 if hot else 2.0)
            v[j] += jit
        vec_ids.append(i)
        vecs.append([float(x) for x in v])
        labels.append(0 if hot else 1 + i % 3)
    pq.write_table(pa.table({
        "vec_id": pa.array(vec_ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), os.path.join(out_dir, "embeddings.parquet"))

    return {"n_docs": n_docs, "n_dup_cluster": n_dup,
            "n_hot_source": (n_docs + 1) // 2,
            "n_vecs": n_vecs, "n_hot_cell": n_vecs - n_vecs // 5}


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_corpus"
    nd = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    nv = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    print(generate(out, nd, nv))
