"""Fuzz the in-process SPARQL parser/evaluator (`knowledge.kg`).

The engine's inputs come from two untrusted directions in production: the
LLM's generated SPARQL (via the text2sparql pipeline's raw-query fallback)
and operator-typed queries against `serve --kg`. Contract under fuzz:

  1. ANY input string either parses+executes or raises ``SparqlSyntaxError``
     (a ValueError) — never a different exception type, never a hang;
  2. mutations of valid queries (truncation, splice, byte flips, token
     deletion) obey the same contract;
  3. valid queries executed against a store always return the SPARQL-JSON
     shape (``head.vars`` + ``results.bindings``).

Handrolled seeded mutation fuzz (no hypothesis dependency), sibling of
``test_json2sparql_fuzz.py``.
"""

import random

import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.kg import (
    SparqlSyntaxError,
    TripleStore,
    execute,
    parse_query,
)

VALID_QUERIES = [
    "SELECT ?s WHERE { ?s <http://p/1> ?o. }",
    'SELECT DISTINCT ?s ?o WHERE { ?s <http://p/1> ?o. FILTER(?o = "x"@en) }',
    "SELECT ?s WHERE { { ?s <http://p/1> <http://o/1>. } UNION { ?s <http://p/2> ?o. } }",
    "SELECT ?s WHERE { ?s <http://p/1> ?o. OPTIONAL { ?o <http://p/2> ?d. } }",
    "SELECT ?s WHERE { ?s <http://p/1> ?o. FILTER NOT EXISTS { ?s <http://p/2> ?x. } }",
    'SELECT ?s WHERE { ?s <http://p/1> ?v. FILTER((?v >= "1"^^xsd:integer) && (?v <= "9"^^xsd:integer)) }',
    "PREFIX ex: <http://ex/> SELECT ?s WHERE { ?s ex:p ?o. ?s rdf:type ex:T. }",
    "SELECT ?s WHERE { ?s <http://p/1> ?o. } # trailing comment",
]

JUNK = [
    "", "   ", "}", "{", "SELECT", "SELECT WHERE", "SELECT ?s WHERE {",
    "SELECT ?s WHERE { ?s }", "ASK { ?s ?p ?o }", "\x00\x01\x02",
    'SELECT ?s WHERE { ?s <http://p/1> "unterminated }',
    "SELECT ?s WHERE { ?s <unterminated ?o. }",
    "SELECT ?s WHERE { ?s <http://p/1> ?o. " * 50,
    "((((((((((", '"""', "?? ?s", "# only a comment",
]


@pytest.fixture(scope="module")
def store():
    st = TripleStore()
    for i in range(6):
        st.add(f"http://s/{i}", "http://p/1", f"http://o/{i % 3}")
        st.add(f"http://s/{i}", "http://p/2", f"http://o/{(i + 1) % 3}")
    return st


def _check_one(store, text):
    """Returns None if contract held, else a description of the violation."""
    try:
        parse_query(text)
    except SparqlSyntaxError:
        return None  # clean rejection — fine
    except RecursionError:
        return "RecursionError from parse_query"
    except Exception as e:  # noqa: BLE001
        return f"parse raised {type(e).__name__}: {e!r}"
    try:
        result = execute(store, text)
    except SparqlSyntaxError:
        return None  # evaluator may reject features the parser accepted
    except Exception as e:  # noqa: BLE001
        return f"execute raised {type(e).__name__}: {e!r}"
    if "head" not in result or "results" not in result:
        return f"malformed result shape: {sorted(result)}"
    return None


def test_valid_queries_execute(store):
    for q in VALID_QUERIES:
        result = execute(store, q)
        assert "vars" in result["head"] and "bindings" in result["results"], q


def test_junk_inputs_reject_cleanly(store):
    failures = [(q, v) for q in JUNK if (v := _check_one(store, q))]
    assert not failures, failures


def test_mutation_fuzz(store):
    """Random mutations of valid queries: truncate, splice two queries,
    delete a token, insert a hostile fragment, flip characters."""
    hostile_bits = ["}", "{", '"', "<", "UNION", "FILTER(", "^^", "@", "?",
                    "#", "\n", "\\", "NOT EXISTS", "OPTIONAL"]
    failures = []
    for seed in range(400):
        r = random.Random(seed)
        q = r.choice(VALID_QUERIES)
        kind = r.randrange(5)
        if kind == 0:  # truncate
            q = q[: r.randrange(len(q) + 1)]
        elif kind == 1:  # splice two queries at random cut points
            other = r.choice(VALID_QUERIES)
            q = q[: r.randrange(len(q) + 1)] + other[r.randrange(len(other) + 1):]
        elif kind == 2:  # delete a whitespace-token
            toks = q.split(" ")
            if len(toks) > 1:
                del toks[r.randrange(len(toks))]
            q = " ".join(toks)
        elif kind == 3:  # insert a hostile fragment
            pos = r.randrange(len(q) + 1)
            q = q[:pos] + r.choice(hostile_bits) + q[pos:]
        else:  # flip 1-3 characters
            chars = list(q)
            for _ in range(r.randint(1, 3)):
                if chars:
                    chars[r.randrange(len(chars))] = chr(r.randrange(32, 127))
            q = "".join(chars)
        v = _check_one(store, q)
        if v:
            failures.append((seed, q[:120], v))
    assert not failures, f"{len(failures)}/400 mutants violated the contract; first: {failures[0]}"
