"""fastText-style hashed bag-of-ngrams quality classifier.

The model-based quality filter of the DCLM / LLaMA / GPT-3 curation
recipes: a tiny linear classifier over hashed word uni+bigram buckets
scores every document for "looks like quality prose", and the corpus is
filtered or mixture-weighted on that probability.  The model is trained
ONCE on a small labeled set (driver-side numpy here, exactly like the
reference trains its pair classifier driver-side on the labeled CSV,
/root/reference/src/classification.py:301-392) — the 100 TB-scale part is
SCORING, which runs as pure JVM column expressions + one broadcast join in
`operators.webtext.quality_classifier_scores`.

Everything is engine-portable by construction so the Spark plan can be
value-checked against DuckDB:

* gram hash  h(g) = first 8 hex chars of md5(g) as uint32, mod n_buckets
  (same idiom as webtext._uniform_hash);
* features   x = bucket-count vector of a doc's unigrams+bigrams, divided
  by the gram count (fastText's mean-of-embeddings with dim=1 buckets);
* model      logistic regression, full-batch GD, fixed seed/iters — the
  trained weights are a pure deterministic function of the code, so the
  SQL oracle regenerates them by calling `train_quality_classifier()` and
  inlining the weights as a VALUES table.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .text_analysis import STOPWORDS

N_BUCKETS = 256

# content vocabulary for the synthetic labeled set (fixed: the training
# corpus is part of the model definition, like a shipped .bin would be)
_CONTENT = (
    "library", "archive", "catalog", "record", "history", "science",
    "music", "letter", "collection", "university", "press", "journal",
    "report", "study", "novel", "poetry", "author", "editor", "volume",
    "manuscript",
)


def gram_bucket(gram: str, n_buckets: int = N_BUCKETS) -> int:
    """Portable gram hash: int(md5(g)[:8], 16) % n_buckets."""
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def doc_grams(text: str) -> list[str]:
    """Unigrams + bigrams of lowercased whitespace tokens — the exact gram
    set the Spark scorer explodes (webtext._tokens semantics)."""
    toks = text.lower().strip().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def featurize(texts: list[str], n_buckets: int = N_BUCKETS) -> np.ndarray:
    """(n_docs, n_buckets) mean-bucket-count features."""
    x = np.zeros((len(texts), n_buckets))
    for i, t in enumerate(texts):
        grams = doc_grams(t)
        for g in grams:
            x[i, gram_bucket(g, n_buckets)] += 1.0
        if grams:
            x[i] /= len(grams)
    return x


def synth_labeled_set(n: int = 400, seed: int = 0) -> tuple[list[str], np.ndarray]:
    """Deterministic labeled set: positives are stopword/content-word prose,
    negatives are uniform gibberish tokens (no stopwords, unbounded vocab) —
    the separation a real quality model exploits (in-domain n-grams vs
    out-of-domain mass spread uniformly over the hash buckets)."""
    rng = np.random.default_rng(seed)
    texts, y = [], []
    for _ in range(n // 2):
        k = int(rng.integers(8, 20))
        words = [
            STOPWORDS[int(rng.integers(len(STOPWORDS)))]
            if j % 2 == 0
            else _CONTENT[int(rng.integers(len(_CONTENT)))]
            for j in range(k)
        ]
        texts.append(" ".join(words))
        y.append(1.0)
        toks = [
            "".join(chr(97 + int(c)) for c in rng.integers(0, 26, int(rng.integers(4, 12))))
            for _ in range(k)
        ]
        texts.append(" ".join(toks))
        y.append(0.0)
    return texts, np.asarray(y)


def train_quality_classifier(
    n_buckets: int = N_BUCKETS,
    n_docs: int = 400,
    seed: int = 0,
    iters: int = 2000,
    lr: float = 20.0,
) -> tuple[np.ndarray, float]:
    """Full-batch logistic-regression GD on the synthetic labeled set.
    Deterministic: fixed seed, fixed iteration count, float64 throughout —
    callers (including the DuckDB oracle generator) always get bit-identical
    (weights, bias)."""
    texts, y = synth_labeled_set(n_docs, seed)
    x = featurize(texts, n_buckets)
    w = np.zeros(n_buckets)
    b = 0.0
    n = len(y)
    for _ in range(iters):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (x.T @ g) / n
        b -= lr * float(g.mean())
    return w, b
