"""Graphite glob compiler: pattern -> (anchored regex, pushdown predicates).

Reimplements the *semantics* of the reference's glob handling
(biggraphite/glob_utils.py: tokenizer :69-162, parser :437-657, regex
translation :165-211) with a fresh recursive-descent implementation.  The
grammar:

    ``*``        any run of non-dot chars (within one component)
    ``?``        exactly one non-dot char
    ``**``       globstar: any run of chars *including* dots; at most one per
                 pattern (reference rejects >1, cassandra_sasi.py:166-169)
    ``[abc]``    char class, ``[a-z]`` ranges, ``[!abc]`` negation
    ``{a,b}``    alternation; may nest and combine with other tokens

The engine uses the same two-phase plan as the reference (glob_utils.py:
367-370, drivers/cassandra.py:2076,2087):

1. a cheap *may-match* prefilter pushed into the storage scan — here that is
   a set of Column predicates over the catalog's ``p0..pN``/``depth`` columns
   (standing in for the reference's SASI/Lucene/ES per-component indexes,
   cassandra_sasi.py:67-272), which Catalyst pushes into Parquet row-group
   stats; and
2. the authoritative anchored-regex post-filter (``rlike``).

This module is pure Python (no Spark import); ``operators/find.py`` turns the
:class:`GlobPlan` into Columns.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field
from typing import Optional

from .model import InvalidArgumentError

#: reference rejects globs with more components than it has index columns
#: (drivers/cassandra.py:2094-2098, COMPONENTS_MAX_LEN=64).
MAX_GLOB_COMPONENTS = 64

#: cap on brace-expansion when enumerating a component into literals for an
#: ``isin`` pushdown (reference caps combination expansion similarly,
#: cassandra_sasi.py:110-134: drop selectors past 42 generated queries; for us
#: the cap only bounds predicate size, the regex stays authoritative).
MAX_ENUM_EXPANSION = 64

GLOBSTAR = "**"


# ---------------------------------------------------------------------------
# Component AST
# ---------------------------------------------------------------------------
# Nodes: ("lit", str) | ("any1",) | ("star",) | ("class", negated, body)
#        | ("alt", [node_list, ...])


class GlobError(InvalidArgumentError):
    """Malformed glob pattern."""


def _parse_nodes(s: str, i: int, terminators: str) -> tuple[list, int]:
    """Parse a token sequence until a terminator char or end of string."""
    nodes: list = []
    lit: list[str] = []

    def flush() -> None:
        if lit:
            nodes.append(("lit", "".join(lit)))
            lit.clear()

    n = len(s)
    while i < n:
        c = s[i]
        if c in terminators:
            break
        if c == "*":
            flush()
            if i + 1 < n and s[i + 1] == "*":
                raise GlobError("globstar inside a component")
            nodes.append(("star",))
            i += 1
        elif c == "?":
            flush()
            nodes.append(("any1",))
            i += 1
        elif c == "[":
            flush()
            j = s.find("]", i + 1)
            if j == -1:
                raise GlobError(f"unclosed character class in {s!r}")
            body = s[i + 1 : j]
            negated = body.startswith("!")
            if negated:
                body = body[1:]
            if not body:
                raise GlobError(f"empty character class in {s!r}")
            nodes.append(("class", negated, body))
            i = j + 1
        elif c == "{":
            flush()
            alts, i = _parse_alternation(s, i + 1)
            nodes.append(("alt", alts))
        else:
            # ',' ']' '}' outside their construct are literal characters
            lit.append(c)
            i += 1
    flush()
    return nodes, i


def _parse_alternation(s: str, i: int) -> tuple[list, int]:
    """Parse ``{a,b,...}`` bodies (recursive; empty alternatives allowed)."""
    alts: list = []
    while True:
        nodes, i = _parse_nodes(s, i, terminators=",}")
        alts.append(nodes)
        if i >= len(s):
            raise GlobError(f"unclosed brace in {s!r}")
        if s[i] == ",":
            i += 1
            continue
        # s[i] == "}"
        return alts, i + 1


def parse_component(comp: str) -> list:
    """Parse one dot-free glob component into its AST node list."""
    nodes, i = _parse_nodes(comp, 0, terminators="")
    if i != len(comp):
        raise GlobError(f"trailing garbage in component {comp!r}")
    return nodes


# ---------------------------------------------------------------------------
# AST -> regex
# ---------------------------------------------------------------------------

def _class_to_regex(negated: bool, body: str) -> str:
    # Escape regex-special chars inside the class except '-' (ranges).
    out = []
    for ch in body:
        if ch in r"\^]":
            out.append("\\" + ch)
        else:
            out.append(ch)
    # A negated class must still never match the component separator.
    return "[^" + "".join(out) + ".]" if negated else "[" + "".join(out) + "]"


def _nodes_to_regex(nodes: list) -> str:
    parts: list[str] = []
    for node in nodes:
        kind = node[0]
        if kind == "lit":
            parts.append(re.escape(node[1]))
        elif kind == "any1":
            parts.append("[^.]")
        elif kind == "star":
            parts.append("[^.]*")
        elif kind == "class":
            parts.append(_class_to_regex(node[1], node[2]))
        elif kind == "alt":
            parts.append("(?:" + "|".join(_nodes_to_regex(a) for a in node[1]) + ")")
        else:  # pragma: no cover
            raise AssertionError(kind)
    return "".join(parts)


# ---------------------------------------------------------------------------
# AST analysis for pushdown
# ---------------------------------------------------------------------------

def _enumerate_literals(nodes: list, cap: int = MAX_ENUM_EXPANSION) -> Optional[list[str]]:
    """Expand a component into the full list of literal strings it matches,
    or None if it contains wildcards / would exceed ``cap`` expansions.

    Mirrors the reference's combination expansion for ``{...}`` selectors
    (cassandra_sasi.py:110-134) without its query-count concerns.
    """
    choices: list[list[str]] = []
    total = 1
    for node in nodes:
        kind = node[0]
        if kind == "lit":
            choices.append([node[1]])
        elif kind == "class" and not node[1]:
            expanded = _expand_class(node[2])
            if expanded is None:
                return None
            choices.append(expanded)
            total *= len(expanded)
        elif kind == "alt":
            sub: list[str] = []
            for alt_nodes in node[1]:
                alt_lits = _enumerate_literals(alt_nodes, cap)
                if alt_lits is None:
                    return None
                sub.extend(alt_lits)
            choices.append(sub)
            total *= max(len(sub), 1)
        else:
            return None
        if total > cap:
            return None
    return ["".join(combo) for combo in itertools.product(*choices)] if choices else [""]


def _expand_class(body: str) -> Optional[list[str]]:
    """Expand a (non-negated) char class into single-char literals."""
    out: list[str] = []
    i = 0
    while i < len(body):
        if i + 2 < len(body) and body[i + 1] == "-":
            lo, hi = ord(body[i]), ord(body[i + 2])
            if hi < lo or hi - lo > MAX_ENUM_EXPANSION:
                return None
            out.extend(chr(c) for c in range(lo, hi + 1))
            i += 3
        else:
            out.append(body[i])
            i += 1
    return out if 0 < len(out) <= MAX_ENUM_EXPANSION else None


def _literal_prefix(nodes: list) -> str:
    """Longest fixed leading literal of a component (for startswith pushdown),
    like the reference's SASI ``LIKE 'prefix%'`` translation
    (cassandra_sasi.py:67-162)."""
    if nodes and nodes[0][0] == "lit":
        return nodes[0][1]
    return ""


# ---------------------------------------------------------------------------
# Whole-pattern compilation
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ComponentPlan:
    """Pushdown info for one glob component at a known position."""

    index: int
    kind: str  # "literal" | "enum" | "prefix" | "any"
    values: tuple[str, ...] = ()  # literal / enum values or (prefix,)


@dataclass(frozen=True)
class GlobPlan:
    """Compiled glob: authoritative regex + best-effort pushdown predicates."""

    pattern: str
    regex: str  # anchored (^...$ handled by caller using fullmatch/rlike '^..$')
    has_globstar: bool
    depth_exact: Optional[int]  # len(components)-1 when no globstar
    depth_min: Optional[int]  # lower bound when globstar present
    components: tuple[ComponentPlan, ...]  # positions before any globstar
    fully_literal: Optional[str]  # exact name when the glob has no wildcard

    def compiled(self) -> "re.Pattern[str]":
        return re.compile(self.regex + r"\Z")


def _split_components(pattern: str) -> Optional[list[str]]:
    """Split on dots that are outside braces/brackets; None if a dot occurs
    inside a brace (then only regex matching applies, no component pushdown)."""
    comps: list[str] = []
    buf: list[str] = []
    depth = 0
    in_class = False
    has_brace_dot = False
    for c in pattern:
        if in_class:
            buf.append(c)
            if c == "]":
                in_class = False
            continue
        if c == "[":
            in_class = True
            buf.append(c)
        elif c == "{":
            depth += 1
            buf.append(c)
        elif c == "}":
            depth = max(0, depth - 1)
            buf.append(c)
        elif c == "." and depth == 0:
            comps.append("".join(buf))
            buf.clear()
        else:
            if c == "." and depth > 0:
                has_brace_dot = True
            buf.append(c)
    comps.append("".join(buf))
    return None if has_brace_dot else comps


def glob_to_regex(pattern: str) -> str:
    """Compile a glob to an (unanchored-text, caller-anchors) regex string.

    Translation table per the reference (glob_utils.py:165-211):
    ``*`` -> ``[^.]*``; ``**`` -> ``.*``; ``?`` -> ``[^.]``;
    ``{a,b}`` -> ``(?:a|b)``; ``.`` -> ``\\.``.
    """
    return compile_glob(pattern).regex


def compile_glob(pattern: str) -> GlobPlan:
    """Validate + compile a glob pattern into a :class:`GlobPlan`.

    Raises :class:`GlobError` on malformed patterns, >1 globstar, or too many
    components (reference validity rules: glob_utils.py:39-66,
    cassandra_sasi.py:166-169, cassandra.py:2094-2098).
    """
    if pattern.count(GLOBSTAR) > 1:
        raise GlobError("at most one globstar (**) is supported")
    comps = _split_components(pattern)

    if comps is None:
        # Dots inside braces: regex-only fallback (no positional pushdown).
        # '.' parses as a literal char and re.escape turns it into '\.', which
        # is exactly the separator semantics we want here.
        parts = pattern.split(GLOBSTAR)
        regex = ".*".join(_nodes_to_regex(parse_component(p)) for p in parts)
        return GlobPlan(pattern, regex, GLOBSTAR in pattern, None, None, (), None)

    if len(comps) > MAX_GLOB_COMPONENTS:
        raise GlobError(f"too many components ({len(comps)} > {MAX_GLOB_COMPONENTS})")

    has_globstar = GLOBSTAR in comps or any(GLOBSTAR in c for c in comps)
    regex_parts: list[str] = []
    plans: list[ComponentPlan] = []
    fully_literal_parts: Optional[list[str]] = []
    before_globstar = True

    for idx, comp in enumerate(comps):
        if comp == GLOBSTAR:
            regex_parts.append(".*")
            before_globstar = False
            fully_literal_parts = None
            continue
        if GLOBSTAR in comp:
            # e.g. "a**b": treat the ** run as crossing dots, per the linear
            # translation in the reference (glob_utils.py:165-211).
            sub = [parse_component(p) for p in comp.split(GLOBSTAR)]
            regex_parts.append(".*".join(_nodes_to_regex(p) for p in sub))
            before_globstar = False
            fully_literal_parts = None
            continue
        nodes = parse_component(comp)
        regex_parts.append(_nodes_to_regex(nodes))
        lits = _enumerate_literals(nodes)
        if fully_literal_parts is not None and lits is not None and len(lits) == 1:
            fully_literal_parts.append(lits[0])
        else:
            fully_literal_parts = None
        if before_globstar:
            if lits is not None and len(lits) == 1:
                plans.append(ComponentPlan(idx, "literal", (lits[0],)))
            elif lits is not None:
                plans.append(ComponentPlan(idx, "enum", tuple(lits)))
            else:
                prefix = _literal_prefix(nodes)
                if prefix:
                    plans.append(ComponentPlan(idx, "prefix", (prefix,)))
                else:
                    plans.append(ComponentPlan(idx, "any"))

    regex = r"\.".join(regex_parts)
    n_fixed = sum(1 for c in comps if c != GLOBSTAR and GLOBSTAR not in c)
    depth_exact = None if has_globstar else len(comps) - 1
    depth_min = n_fixed if has_globstar else None
    fully_literal = ".".join(fully_literal_parts) if fully_literal_parts else None
    return GlobPlan(
        pattern=pattern,
        regex=regex,
        has_globstar=has_globstar,
        depth_exact=depth_exact,
        depth_min=depth_min,
        components=tuple(plans),
        fully_literal=fully_literal,
    )


def glob_match(pattern: str, name: str) -> bool:
    """Authoritative single-name matcher (test/driver-side convenience)."""
    if pattern == "":
        return False
    return compile_glob(pattern).compiled().fullmatch(name) is not None
