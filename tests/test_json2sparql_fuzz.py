"""Property-based fuzz of the Sparnatural JSON -> SPARQL compiler.

The reference feeds this compiler straight from an LLM's JSON output
(``src/text2sparql/text2sparql_retrieval.py:30-43``) — adversarial labels,
literals with quotes/newlines, junk variable entries, and placeholder URIs
all occur in production. The goldens in ``test_json2sparql.py`` cover
hand-written happy paths; this file drives randomly generated (and
deliberately hostile) schema-shaped inputs through ``convert`` and asserts
the compiler's contract:

  1. ``convert`` never raises on schema-shaped input;
  2. the output always PARSES and EXECUTES against the in-repo engine
     (``knowledge.kg.execute``) — no comment/quote/brace injection can
     produce invalid SPARQL;
  3. the reconciliation placeholder URI never leaks into the query;
  4. ``optional``/``notExists`` branches produce their wrapper blocks and
     braces stay balanced (scoping invariant).

Handrolled (no hypothesis dependency): seeded ``random.Random`` over a
grammar matching the schema in ``json2sparql.py``'s docstring, plus a pool
of adversarial strings.
"""

import random

import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.json2sparql import (
    PLACEHOLDER,
    convert,
)
from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.kg import (
    TripleStore,
    execute,
    parse_query,
)

URIS = [
    "http://kg/leo",
    "http://kg/mona",
    "https://example.org/ch/item%20one",
    "http://crm/E22",
    "http://crm/E39",
]
PREDS = ["http://crm/P1", "http://crm/P62", "http://crm/P43"]
VARS = ["Painting_1", "Actor_1", "Dim_1", "V0", "V1"]

# strings an LLM emits in the wild: quotes, newlines, SPARQL syntax, unicode
HOSTILE = [
    'quote " inside',
    "new\nline",
    "brace } escape",
    "comment # tail",
    'inject". } FILTER(?x = "1',
    "back\\slash",
    "uniécode中",
    "",
    "   ",
]
LABELS = ["Leonardo", "a label", *HOSTILE]
LITERALS = [3, 4.5, "42", "4.2", "1850-01-01", "Mona Lisa", True, *HOSTILE]


def _rand_values(r: random.Random):
    vals = []
    for _ in range(r.randint(0, 3)):
        kind = r.random()
        if kind < 0.35:
            uri = PLACEHOLDER if r.random() < 0.3 else r.choice(URIS)
            vals.append({"label": r.choice(LABELS),
                         "rdfTerm": {"type": "uri", "value": uri}})
        elif kind < 0.7:
            vals.append({"label": r.choice(LABELS),
                         "rdfTerm": {"type": "literal", "value": r.choice(LITERALS)}})
        else:
            v = {"label": r.choice(LABELS)}
            if r.random() < 0.8:
                v["min"] = r.choice([0, 1.5, "1850-01-01", "7"])
            if r.random() < 0.8:
                v["max"] = r.choice([10, 99.5, "1900-12-31", "88"])
            vals.append(v)
    return vals


def _rand_branch(r: random.Random, depth: int):
    branch = {}
    if r.random() < 0.95:  # occasionally a line-less branch (must be ignored)
        line = {
            "s": r.choice(VARS),
            "p": r.choice(PREDS),
            "o": r.choice(VARS),
        }
        if r.random() < 0.5:
            line["sType"] = r.sample(URIS, r.randint(1, 2))
        if r.random() < 0.5:
            line["oType"] = r.sample(URIS, r.randint(1, 2))
        if r.random() < 0.7:
            line["values"] = _rand_values(r)
        branch["line"] = line
    wrap = r.random()
    if wrap < 0.2:
        branch["optional"] = True
    elif wrap < 0.4:
        branch["notExists"] = True
    if depth < 2 and r.random() < 0.4:
        branch["children"] = [_rand_branch(r, depth + 1) for _ in range(r.randint(1, 2))]
    return branch


def _rand_query(r: random.Random):
    variables = [{"termType": "Variable", "value": v}
                 for v in r.sample(VARS, r.randint(1, 3))]
    if r.random() < 0.3:  # junk entries the compiler must skip
        variables.append(r.choice([
            {"termType": "Variable"},            # missing value
            {"termType": "Literal", "value": "x"},
            {},
        ]))
    return {
        "distinct": r.random() < 0.7,
        "variables": variables,
        "branches": [_rand_branch(r, 0) for _ in range(r.randint(1, 4))],
    }


@pytest.fixture(scope="module")
def store():
    st = TripleStore()
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    for i, uri in enumerate(URIS):
        st.add(uri, rdf_type, uri)
        for p in PREDS:
            st.add(uri, p, URIS[(i + 1) % len(URIS)])
    return st


def _branch_flags(branches):
    """(any_optional, any_not_exists) over branches WITH a line. Line-less
    branches emit nothing at all — including their children (the compiler
    returns before walking them, matching the reference's early exit)."""
    opt = ne = False
    for b in branches:
        if "line" not in b:
            continue
        opt = opt or b.get("optional", False)
        ne = ne or (b.get("notExists", False) and not b.get("optional", False))
        o2, n2 = _branch_flags(b.get("children", []) or [])
        opt, ne = opt or o2, ne or n2
    return opt, ne


def test_fuzz_convert_parse_execute(store):
    failures = []
    for seed in range(300):
        r = random.Random(seed)
        q = _rand_query(r)
        try:
            sparql = convert(q)
        except Exception as e:  # invariant 1
            failures.append((seed, f"convert raised {type(e).__name__}: {e}"))
            continue
        if PLACEHOLDER in sparql:  # invariant 3
            failures.append((seed, "placeholder URI leaked"))
            continue
        try:
            parse_query(sparql)  # invariant 2a: always valid SPARQL
            result = execute(store, sparql)  # invariant 2b: executes
        except Exception as e:
            failures.append((seed, f"{type(e).__name__}: {e}\n--- query ---\n{sparql}"))
            continue
        assert "results" in result and "bindings" in result["results"], seed
        # invariant 4: wrapper blocks present iff requested, braces balanced
        opt, ne = _branch_flags(q["branches"])
        if opt:
            assert "OPTIONAL {" in sparql, (seed, sparql)
        if ne:
            assert "FILTER NOT EXISTS {" in sparql, (seed, sparql)
    assert not failures, f"{len(failures)}/300 seeds failed; first: {failures[0]}"


def test_fuzz_deterministic():
    """Same input -> same output (the compiler is a pure function)."""
    r = random.Random(7)
    q = _rand_query(r)
    assert convert(q) == convert(q)


def test_hostile_literal_roundtrip(store):
    """A quoted literal value must not escape its string in the output."""
    for value in HOSTILE:
        q = {
            "distinct": True,
            "variables": [{"termType": "Variable", "value": "S"}],
            "branches": [{
                "line": {
                    "s": "S", "p": PREDS[0], "o": "O",
                    "values": [{"label": value,
                                "rdfTerm": {"type": "literal", "value": value}}],
                },
            }],
        }
        sparql = convert(q)
        parse_query(sparql)
        execute(store, sparql)
