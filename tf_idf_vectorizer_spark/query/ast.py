"""Boolean query algebra.

Reimplements the reference's recursive query AST
``None | All | Nop(term) | Not | And | Or``
(/root/reference/src/vectorizer/evaluate/query.rs:4-19) with the same
constructor surface (query.rs:22-75) and leaf-term collection
(query.rs:81-108).  Evaluation lives in query/exact.py (DataFrame set
operations) and query/wand.py (posting-block path); this module is pure
Python AST + an s-expression parser for the fixture query format:

    (and "rust" (or "fast" (not "slow")))
    (all) / (none) / bare "term"
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Query:
    op: str  # 'none' | 'all' | 'term' | 'not' | 'and' | 'or'
    term_: str | None = None
    children: tuple["Query", ...] = field(default_factory=tuple)

    # --- constructors (query.rs:22-47) ---------------------------------
    @staticmethod
    def none() -> "Query":
        return Query("none")

    @staticmethod
    def all() -> "Query":
        return Query("all")

    @staticmethod
    def term(t: str) -> "Query":
        return Query("term", term_=t)

    @staticmethod
    def not_(q: "Query") -> "Query":
        return Query("not", children=(q,))

    @staticmethod
    def and_(*qs: "Query") -> "Query":
        return Query("and", children=tuple(qs))

    @staticmethod
    def or_(*qs: "Query") -> "Query":
        return Query("or", children=tuple(qs))

    # from_freq_or / from_freq_and (query.rs:49-75): fold a term multiset
    @staticmethod
    def from_terms_or(terms: list[str]) -> "Query":
        uniq = list(dict.fromkeys(terms))
        if not uniq:
            return Query.none()
        return Query.or_(*[Query.term(t) for t in uniq])

    @staticmethod
    def from_terms_and(terms: list[str]) -> "Query":
        uniq = list(dict.fromkeys(terms))
        if not uniq:
            return Query.none()
        return Query.and_(*[Query.term(t) for t in uniq])

    # get_all_terms (query.rs:81-108): leaf multiset, including under Not —
    # scoring always uses the full leaf-term frequency vector
    # (scoring.rs:197-206).
    def all_terms(self) -> Counter:
        if self.op == "term":
            return Counter({self.term_: 1})
        acc: Counter = Counter()
        for c in self.children:
            acc += c.all_terms()
        return acc


_TOKEN_RE = re.compile(r'\(|\)|"(?:[^"\\]|\\.)*"|[^\s()"]+')


def parse_sexpr(s: str) -> Query:
    """Parse the fixture s-expression query format into a Query."""
    tokens = _TOKEN_RE.findall(s)
    pos = 0

    def unquote(tok: str) -> str:
        if tok.startswith('"'):
            return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        return tok

    def parse() -> Query:
        nonlocal pos
        tok = tokens[pos]
        pos += 1
        if tok != "(":
            return Query.term(unquote(tok))
        head = tokens[pos].lower()
        pos += 1
        kids: list[Query] = []
        while tokens[pos] != ")":
            kids.append(parse())
        pos += 1
        if head == "all":
            return Query.all()
        if head == "none":
            return Query.none()
        if head == "term":
            return kids[0] if kids else Query.none()
        if head == "not":
            return Query.not_(kids[0])
        if head == "and":
            return Query.and_(*kids)
        if head == "or":
            return Query.or_(*kids)
        raise ValueError(f"unknown query node {head!r}")

    q = parse()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens in query: {s!r}")
    return q
