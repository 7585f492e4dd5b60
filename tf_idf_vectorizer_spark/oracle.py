"""Pure-Python oracle implementing the reference formulas exactly.

Single-threaded, dict-based — used only in tests to assert the Spark
paths (exact and WAND) are rank-identical to the reference semantics:

  idf      /root/reference/src/vectorizer/tfidf.rs:32-40
  tf chain tfidf.rs:61-213 (quantize/denorm per dtype)
  boolean  src/vectorizer/evaluate/query.rs:110-215
  contains scoring.rs:298-314   dot    scoring.rs:317-337
  cosine   scoring.rs:341-407   bm25   scoring.rs:410-435
  sort+topk scoring.rs:87-117 (NaN drop, score desc), deterministic
  tiebreak (score desc, key asc)
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from tf_idf_vectorizer_spark.config import DEFAULT, EngineConfig
from tf_idf_vectorizer_spark.query.ast import Query

F64_EPSILON = 2.220446049250313e-16


class OracleIndex:
    def __init__(
        self,
        docs: dict[object, str],
        config: EngineConfig = DEFAULT,
        tokenize=None,
    ):
        """docs: key -> text (whitespace tokenized unless ``tokenize``
        — e.g. functions.tokenizers.tokenize_cjk_py — is given)."""
        tok = tokenize or str.split
        self.config = config
        self.tf: dict[object, Counter] = {
            k: Counter(tok(t)) for k, t in docs.items()
        }
        self.doc_len = {k: sum(c.values()) for k, c in self.tf.items()}
        self.doc_num = len(docs)
        self.df: Counter = Counter()
        for c in self.tf.values():
            self.df.update(c.keys())
        self.idf = {
            t: np.float32(self.doc_num) / np.float32(d + 1)
            for t, d in self.df.items()
        }
        self.avg_len = sum(self.doc_len.values()) / max(self.doc_num, 1)

    def _eff_tf(self, count: int) -> int:
        return int(self.config.roundtrip_tf(np.array([count]))[0])

    # --- boolean candidates ---------------------------------------------
    def candidates(self, q: Query) -> set:
        keys = set(self.tf.keys())
        if q.op == "none":
            return set()
        if q.op == "all":
            return keys
        if q.op == "term":
            return {k for k, c in self.tf.items() if q.term_ in c}
        if q.op == "not":
            return keys - self.candidates(q.children[0])
        sets = [self.candidates(c) for c in q.children]
        if q.op == "and":
            return set.intersection(*sets) if sets else set()
        if q.op == "or":
            return set.union(*sets) if sets else set()
        raise ValueError(q.op)

    # --- scoring ----------------------------------------------------------
    def doc_norm(self, key) -> float:
        acc = np.float32(0.0)
        for t, c in self.tf[key].items():
            w = np.float32(self._eff_tf(c)) * self.idf[t]
            acc += w * w
        return math.sqrt(float(acc))

    def query_norm(self, terms: Counter) -> float:
        acc = np.float32(0.0)
        for t in sorted(terms):
            if t in self.idf:
                w = np.float32(self._eff_tf(terms[t])) * self.idf[t]
                acc += w * w
        return math.sqrt(float(acc))

    def score(self, algo: str, key, terms: Counter, k1: float, b: float) -> float:
        doc = self.tf[key]
        if algo == "contains":
            return 1.0
        if algo == "dot":
            s = 0.0
            for t, qc in terms.items():
                if t in self.idf and t in doc:
                    idf = float(self.idf[t])
                    s += self._eff_tf(qc) * self._eff_tf(doc[t]) * idf * idf
            return s
        if algo == "cosine":
            dot = np.float32(0.0)
            for t, qc in terms.items():
                if t in self.idf and t in doc:
                    idf = self.idf[t]
                    dot += (
                        np.float32(self._eff_tf(qc))
                        * np.float32(self._eff_tf(doc[t]))
                        * idf
                        * idf
                    )
            denom = self.query_norm(terms) * self.doc_norm(key) + F64_EPSILON
            return float(dot) / denom
        if algo == "bm25":
            s = 0.0
            dl = self.doc_len[key]
            for t in terms:  # multiplicity ignored (scoring.rs:424)
                if t in self.idf and t in doc:
                    tfd = float(self._eff_tf(doc[t]))
                    idf = float(self.idf[t])
                    s += (
                        math.log(idf)
                        * (tfd * (k1 + 1.0))
                        / (tfd + k1 * (1.0 - b + b * dl / self.avg_len))
                    )
            return s
        raise ValueError(algo)

    def search(
        self,
        algo: str,
        query: Query,
        k: int | None = None,
        k1: float | None = None,
        b: float | None = None,
    ) -> list[tuple[object, float, int]]:
        return self.similarity(algo, query.all_terms(), query, k, k1, b)

    def similarity(
        self,
        algo: str,
        terms: Counter | list[str],
        filter_query: Query | None = None,
        k: int | None = None,
        k1: float | None = None,
        b: float | None = None,
    ) -> list[tuple[object, float, int]]:
        if not isinstance(terms, Counter):
            terms = Counter(terms)
        k1 = self.config.k1 if k1 is None else k1
        b = self.config.b if b is None else b
        if algo == "contains":
            cand = {
                key for key, c in self.tf.items() if any(t in c for t in terms)
            }
        else:
            fq = filter_query or Query.from_terms_or(list(terms.keys()))
            cand = self.candidates(fq)
        hits = []
        for key in cand:
            s = self.score(algo, key, terms, k1, b)
            if not math.isnan(s):
                hits.append((key, s, self.doc_len[key]))
        hits.sort(key=lambda h: (-h[1], h[0]))
        return hits[:k] if k else hits
