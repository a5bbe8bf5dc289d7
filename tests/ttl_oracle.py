"""Minimal Turtle parser — golden-file oracle for triple parity tests.

Parses the subset of Turtle that rdflib's serializer emits for the reference
corpus (/root/reference/extremexp_kg_matic/data/five_papers.ttl): @prefix
directives, pname/IRI terms, `a`, `;`/`,` continuation lists, quoted string
literals with optional ^^datatype, and bare numeric literals (Turtle
shorthand: token with '.' → xsd:decimal, bare integer → xsd:integer).

Produces canonical comparison tuples
    (subj_iri, pred_iri, obj_lexical, obj_is_iri, obj_datatype_or_None)
matching FIXTURES.md §3. Plain (untyped) literals keep datatype None —
the typed-vs-untyped xsd:string split is semantic in the reference output
(SURVEY.md §1.2) and must survive the round trip.
"""

from __future__ import annotations

import re

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"

Triple = tuple[str, str, str, bool, str | None]

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<iri><[^>]*>)
  | (?P<dtsep>\^\^)
  | (?P<pname>[A-Za-z][\w.-]*:[^\s;,^]*[^\s;,.^]|[A-Za-z][\w.-]*:)
  | (?P<decimal>[+-]?\d+\.\d+)
  | (?P<integer>[+-]?\d+)
  | (?P<kw_a>\ba\b)
  | (?P<punct>[;,.\[\]])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
                continue
            if n == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if n == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _tokenize(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"ttl_oracle: cannot tokenize at {text[pos:pos+40]!r}")
        pos = m.end()
        if m.lastgroup in ("ws", "comment"):
            continue
        yield m.lastgroup, m.group()


def parse_ttl(text: str) -> set[Triple]:
    prefixes = dict(re.findall(r"@prefix\s+([\w.-]*):\s*<([^>]*)>\s*\.", text))
    body = re.sub(r"@prefix[^\n]*\n", "", text)

    def expand(kind: str, val: str) -> str:
        if kind == "iri":
            return val[1:-1]
        pfx, local = val.split(":", 1)
        return prefixes[pfx] + local

    triples: set[Triple] = set()
    toks = list(_tokenize(body))
    i, n = 0, len(toks)
    while i < n:
        subj = expand(*toks[i])
        i += 1
        while True:  # predicate-object list
            pkind, pval = toks[i]
            pred = RDF_TYPE if pkind == "kw_a" else expand(pkind, pval)
            i += 1
            while True:  # object list
                okind, oval = toks[i]
                if okind == "string":
                    lex, dt = _unescape(oval[1:-1]), None
                    i += 1
                    if i < n and toks[i][0] == "dtsep":
                        dt = expand(*toks[i + 1])
                        i += 2
                    triples.add((subj, pred, lex, False, dt))
                elif okind == "decimal":
                    triples.add((subj, pred, oval, False, XSD_DECIMAL))
                    i += 1
                elif okind == "integer":
                    triples.add((subj, pred, oval, False, XSD_INTEGER))
                    i += 1
                else:
                    triples.add((subj, pred, expand(okind, oval), True, None))
                    i += 1
                if toks[i][1] == ",":
                    i += 1
                    continue
                break
            if toks[i][1] == ";":
                i += 1
                if toks[i][1] == ".":
                    i += 1
                    break
                continue
            if toks[i][1] == ".":
                i += 1
                break
            raise ValueError(f"unexpected {toks[i]!r}")
    return triples


def load_golden(path: str) -> set[Triple]:
    with open(path, encoding="utf-8") as f:
        return parse_ttl(f.read())
