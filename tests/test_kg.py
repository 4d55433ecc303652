"""In-process SPARQL engine (`knowledge.kg`): parser, evaluator, store, and
the offline end-to-end knowledge pipeline it unlocks."""

import json

import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.knowledge import (
    FakeLLMClient,
    Literal,
    LocalKGSparqlClient,
    ReconciliationService,
    SparqlSyntaxError,
    Text2JsonToSparqlPipeline,
    Text2SparqlRetrieval,
    TripleStore,
    URI,
    convert,
    execute,
    fix_dimension_query,
    fix_label_union,
    parse_query,
)
from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.entity_linking import QueryInput
from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.json2sparql import PLACEHOLDER

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
SKOS_EXACT = "http://www.w3.org/2004/02/skos/core#exactMatch"
SCHEMA_DESC = "https://schema.org/description"
CRM = "http://www.cidoc-crm.org/cidoc-crm"
CH = "https://example.org/ch"
DA = f"{CH}/DigitalArtefact"
P62 = f"{CRM}/P62_depicts"
P43 = f"{CRM}/P43_has_dimension"
P90 = f"{CRM}/P90_has_value"
E54 = f"{CRM}/E54_Dimension"


def _uuids(result, var="DigitalArtefact"):
    return [
        b[var]["value"].rsplit("/", 1)[-1]
        for b in result["results"]["bindings"]
        if var in b
    ]


@pytest.fixture()
def ch_store():
    """A small Cultural-Heritage graph: artefacts with labels, depicted
    entities, and CIDOC-CRM dimension chains."""
    store = TripleStore()
    artefacts = [
        ("uuid-000", "madonna and child", "mary", 50),
        ("uuid-001", "blue temple", None, 80),
        ("uuid-002", "madonna della seggiola", "mary", 110),
        ("uuid-003", "portrait of a man", "leonardo", 80),
    ]
    for uuid, label, depicted, height in artefacts:
        art = f"{CH}/artefact/{uuid}"
        store.add(art, RDF_TYPE, URI(DA))
        store.add(art, RDFS_LABEL, Literal(label, lang="en"))
        if depicted:
            store.add(art, P62, URI(f"{CH}/entity/{depicted}"))
        dim = f"{CH}/dim/{uuid}"
        store.add(art, P43, URI(dim))
        store.add(dim, RDF_TYPE, URI(E54))
        store.add(dim, P90, Literal(str(height), "http://www.w3.org/2001/XMLSchema#integer"))
    store.add(f"{CH}/entity/mary", RDFS_LABEL, Literal("madonna", lang="en"))
    store.add(f"{CH}/entity/mary", RDF_TYPE, URI(f"{CH}/Person"))
    store.add(f"{CH}/entity/leonardo", RDFS_LABEL, Literal("leonardo da vinci"))
    store.add(f"{CH}/entity/leonardo", RDF_TYPE, URI(f"{CH}/Person"))
    # an external authority record pointing at mary (skos:exactMatch branch)
    store.add(f"{CH}/wikidata/Q1", SKOS_EXACT, URI(f"{CH}/entity/mary"))
    store.add(f"{CH}/wikidata/Q1", RDFS_LABEL, Literal("madonna (mary)"))
    return store


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_basic_shapes():
    q = parse_query(
        """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT DISTINCT ?a ?b WHERE {
          ?a rdf:type <http://t/T>.  # trailing comment with rdf:type inside
          OPTIONAL { ?a <http://p/q> ?b . }
          { ?a <http://p/r> <http://o/1>. } UNION { ?a <http://p/r> <http://o/2>. }
          FILTER NOT EXISTS { ?a <http://p/bad> ?x . }
          FILTER(?b >= "3"^^<http://www.w3.org/2001/XMLSchema#integer>)
        }"""
    )
    assert q.distinct and q.variables == ["a", "b"]
    assert len(q.where.elements) == 3 and len(q.where.filters) == 2


def test_parse_errors():
    with pytest.raises(SparqlSyntaxError):
        parse_query("SELECT WHERE { }")  # no variables
    with pytest.raises(SparqlSyntaxError):
        parse_query("SELECT ?x WHERE { ?x <http://p> }")  # incomplete triple
    with pytest.raises(SparqlSyntaxError):
        parse_query("SELECT ?x WHERE { ?x <http://p ?y . }")  # unterminated URI
    with pytest.raises(SparqlSyntaxError):
        parse_query("SELECT ?x WHERE { ?x unknown:p ?y . }")  # unknown prefix


def test_uri_hash_is_not_a_comment():
    q = parse_query(
        "SELECT ?x WHERE { ?x <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?t . }"
    )
    tp = q.where.elements[0]
    assert tp.p.value == RDF_TYPE


# ---------------------------------------------------------------------------
# store + loaders
# ---------------------------------------------------------------------------


def test_store_add_infers_uri_vs_literal():
    store = TripleStore()
    store.add("http://s", "http://p", "http://obj")
    store.add("http://s", "http://p", "plain text")
    assert isinstance(store.triples[0][2], URI)
    assert isinstance(store.triples[1][2], Literal)


def test_store_from_json_and_file(tmp_path):
    doc = {
        "triples": [
            ["http://s1", RDF_TYPE, {"uri": "http://T"}],
            ["http://s1", RDFS_LABEL, {"value": "hello", "lang": "en"}],
            ["http://s1", "http://p/height", {"value": "42", "datatype": "http://www.w3.org/2001/XMLSchema#integer"}],
            ["http://s2", "http://p/rel", "http://s1"],
        ]
    }
    path = tmp_path / "kg.json"
    path.write_text(json.dumps(doc))
    for store in (TripleStore.from_json(doc), TripleStore.from_json(str(path))):
        assert len(store) == 4
        out = execute(store, "SELECT ?o WHERE { <http://s1> <http://www.w3.org/2000/01/rdf-schema#label> ?o . }")
        assert out["results"]["bindings"][0]["o"] == {
            "type": "literal", "value": "hello", "xml:lang": "en",
        }


def test_store_from_ntriples():
    text = """# a comment line
<http://s1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://T> .
<http://s1> <http://www.w3.org/2000/01/rdf-schema#label> "a \\"quoted\\" label"@en .
<http://s1> <http://p/height> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
"""
    store = TripleStore.from_ntriples(text)
    assert len(store) == 3
    assert store.triples[1][2] == Literal('a "quoted" label', None, "en")
    with pytest.raises(SparqlSyntaxError):
        TripleStore.from_ntriples("not ntriples")


# ---------------------------------------------------------------------------
# evaluator semantics
# ---------------------------------------------------------------------------


def test_join_and_distinct(ch_store):
    out = execute(
        ch_store,
        f"SELECT DISTINCT ?DigitalArtefact WHERE {{ ?DigitalArtefact <{RDF_TYPE}> <{DA}> . }}",
    )
    assert _uuids(out) == ["uuid-000", "uuid-001", "uuid-002", "uuid-003"]


def test_union(ch_store):
    out = execute(
        ch_store,
        f"""SELECT DISTINCT ?a WHERE {{
          ?a <{RDF_TYPE}> <{DA}> .
          {{ ?a <{P62}> <{CH}/entity/mary>. }} UNION {{ ?a <{P62}> <{CH}/entity/leonardo>. }}
        }}""",
    )
    assert sorted(_uuids(out, "a")) == ["uuid-000", "uuid-002", "uuid-003"]


def test_optional_keeps_unmatched(ch_store):
    out = execute(
        ch_store,
        f"""SELECT ?a ?e WHERE {{
          ?a <{RDF_TYPE}> <{DA}> .
          OPTIONAL {{ ?a <{P62}> ?e . }}
        }}""",
    )
    rows = out["results"]["bindings"]
    assert len(rows) == 4
    by_uuid = {r["a"]["value"].rsplit("/", 1)[-1]: r for r in rows}
    assert "e" not in by_uuid["uuid-001"]  # no depicts edge, still present
    assert by_uuid["uuid-000"]["e"]["value"].endswith("/mary")


def test_filter_not_exists(ch_store):
    out = execute(
        ch_store,
        f"""SELECT ?a WHERE {{
          ?a <{RDF_TYPE}> <{DA}> .
          FILTER NOT EXISTS {{ ?a <{P62}> ?e . }}
        }}""",
    )
    assert _uuids(out, "a") == ["uuid-001"]


def test_numeric_range_filter(ch_store):
    out = execute(
        ch_store,
        f"""PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?a WHERE {{
          ?a <{P43}> ?d . ?d <{P90}> ?v .
          FILTER((?v >= "60"^^xsd:integer) && (?v <= "100"^^xsd:integer))
        }}""",
    )
    assert sorted(_uuids(out, "a")) == ["uuid-001", "uuid-003"]


def test_numeric_compare_is_numeric_not_lexical(ch_store):
    # "110" < "50" lexically but not numerically
    out = execute(
        ch_store,
        f"""PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?a WHERE {{ ?a <{P43}> ?d . ?d <{P90}> ?v .
        FILTER(?v >= "100"^^xsd:integer) }}""",
    )
    assert _uuids(out, "a") == ["uuid-002"]


def test_string_functions_and_lang_leniency(ch_store):
    out = execute(
        ch_store,
        f"""SELECT ?a WHERE {{
          ?a <{RDF_TYPE}> <{DA}> .
          ?a <{RDFS_LABEL}> ?label .
          FILTER(STRSTARTS(LCASE(STR(?label)), "madonna") || CONTAINS(LCASE(?label), "temple"))
        }}""",
    )
    assert sorted(_uuids(out, "a")) == ["uuid-000", "uuid-001", "uuid-002"]


def test_equality_filter_typed_literal(ch_store):
    out = execute(
        ch_store,
        f"""PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?a WHERE {{ ?a <{P43}> ?d . ?d <{P90}> ?v . FILTER(?v = "80"^^xsd:integer) }}""",
    )
    assert sorted(_uuids(out, "a")) == ["uuid-001", "uuid-003"]


def test_unbound_variable_makes_filter_false(ch_store):
    out = execute(
        ch_store,
        f"""SELECT ?a WHERE {{
          ?a <{RDF_TYPE}> <{DA}> .
          OPTIONAL {{ ?a <{P62}> ?e . }}
          FILTER(CONTAINS(STR(?e), "mary"))
        }}""",
    )
    # uuid-001 has no ?e: expression errors -> filter false -> row dropped
    assert sorted(_uuids(out, "a")) == ["uuid-000", "uuid-002"]


def test_exists_in_expression(ch_store):
    out = execute(
        ch_store,
        f"""SELECT ?a WHERE {{
          ?a <{RDF_TYPE}> <{DA}> .
          FILTER(EXISTS {{ ?a <{P62}> <{CH}/entity/leonardo> }} || EXISTS {{ ?a <{P62}> <{CH}/entity/mary> }})
        }}""",
    )
    assert sorted(_uuids(out, "a")) == ["uuid-000", "uuid-002", "uuid-003"]


def test_shared_variable_join_consistency(ch_store):
    # ?e must bind consistently across two triples
    out = execute(
        ch_store,
        f"""SELECT ?a ?label WHERE {{
          ?a <{P62}> ?e . ?e <{RDFS_LABEL}> ?label .
        }}""",
    )
    rows = {
        b["a"]["value"].rsplit("/", 1)[-1]: b["label"]["value"]
        for b in out["results"]["bindings"]
    }
    assert rows == {
        "uuid-000": "madonna",
        "uuid-002": "madonna",
        "uuid-003": "leonardo da vinci",
    }


# ---------------------------------------------------------------------------
# compiler output runs on the engine
# ---------------------------------------------------------------------------


def test_compiled_query_uri_values_union(ch_store):
    doc = {
        "distinct": True,
        "variables": [{"termType": "Variable", "value": "DigitalArtefact"}],
        "branches": [{
            "line": {
                "s": "DigitalArtefact", "p": P62, "o": "Entity_1",
                "sType": [DA], "oType": [f"{CH}/Person"],
                "values": [
                    {"label": "mary", "rdfTerm": {"type": "uri", "value": f"{CH}/entity/mary"}},
                    {"label": "leo", "rdfTerm": {"type": "uri", "value": f"{CH}/entity/leonardo"}},
                ],
            },
        }],
    }
    out = execute(ch_store, convert(doc))
    assert sorted(_uuids(out)) == ["uuid-000", "uuid-002", "uuid-003"]


def test_compiled_query_range_and_not_exists(ch_store):
    doc = {
        "distinct": True,
        "variables": [{"termType": "Variable", "value": "DigitalArtefact"}],
        "branches": [
            {
                "line": {
                    "s": "DigitalArtefact", "p": P43, "o": "Dimension_1",
                    "sType": [DA], "oType": [E54], "values": [],
                },
                "children": [{
                    "line": {
                        "s": "Dimension_1", "p": P90, "o": "Value_1",
                        "sType": [E54], "oType": [],
                        "values": [{"min": 60, "max": 120, "label": "60-120"}],
                    },
                }],
            },
            {
                "notExists": True,
                "line": {
                    "s": "DigitalArtefact", "p": P62, "o": "Entity_1",
                    "sType": [DA], "oType": [],
                    "values": [{"label": "mary", "rdfTerm": {"type": "uri", "value": f"{CH}/entity/mary"}}],
                },
            },
        ],
    }
    # dimensions in [60, 120] minus artefacts depicting mary
    out = execute(ch_store, convert(doc))
    assert sorted(_uuids(out)) == ["uuid-001", "uuid-003"]


def test_postfix_passes_still_execute(ch_store):
    sparql = (
        "SELECT DISTINCT ?DigitalArtefact ?label WHERE {\n"
        f"  ?DigitalArtefact <{RDF_TYPE}> <{DA}>.\n"
        f"  ?DigitalArtefact <{RDFS_LABEL}> ?label .\n"
        '  FILTER(CONTAINS(LCASE(STR(?label)), "temple"))\n'
        "}"
    )
    rewritten = fix_label_union(sparql)
    assert "UNION" in rewritten
    out = execute(ch_store, rewritten)
    assert _uuids(out) == ["uuid-001"]
    # schema:description branch matches too
    ch_store.add(f"{CH}/artefact/uuid-003", SCHEMA_DESC, Literal("a temple interior"))
    out2 = execute(ch_store, rewritten)
    assert sorted(_uuids(out2)) == ["uuid-001", "uuid-003"]


def test_dimension_fix_output_executes(ch_store):
    malformed = (
        "SELECT DISTINCT ?DigitalArtefact WHERE {\n"
        f"  ?DigitalArtefact <{RDF_TYPE}> <{DA}>.\n"
        f"  ?DigitalArtefact <{P43}> ?Dimension_1 .\n"
        "  ?Dimension_1 rdf:type <http://www.cidoc-crm.org/cidoc-crm/E54_Dimension> .\n"
        "  FILTER(?Value_1 >= \"100\"^^xsd:integer)\n"
        "}"
    )
    fixed = fix_dimension_query(malformed)
    assert "P90_has_value" in fixed
    out = execute(ch_store, fixed)
    assert _uuids(out) == ["uuid-002"]


# ---------------------------------------------------------------------------
# entity linking against the engine
# ---------------------------------------------------------------------------


def test_reconciliation_fuzzy_and_exact(ch_store):
    svc = ReconciliationService(LocalKGSparqlClient(ch_store))
    # P62 requires exact label match
    assert [r.id for r in svc.search_entity("Madonna", predicate=P62)] == [f"{CH}/entity/mary"]
    assert svc.search_entity("madon", predicate=P62) == []
    # other predicates use the 7-way fuzzy filter (prefix match here)
    hits = svc.search_entity("leonardo", type_uri=[f"{CH}/Person"], predicate=f"{CRM}/P14_carried_out_by")
    assert hits == []  # no P14 edges in the graph: the label branch needs ?s <pred> ?x
    hits2 = svc.search_entity("madonna (mary)", predicate=P62)
    # resolved THROUGH the skos:exactMatch authority record
    assert [r.id for r in hits2] == [f"{CH}/entity/mary"]


def test_reconciliation_batch_groups_and_caches(ch_store):
    client = LocalKGSparqlClient(ch_store)
    svc = ReconciliationService(client)
    queries = {
        "a": QueryInput(query="madonna", type=None, predicate=P62),
        "b": QueryInput(query="madonna (mary)", type=None, predicate=P62),
    }
    results = svc.reconcile_batch(queries)
    assert [r.id for r in results["a"]] == [f"{CH}/entity/mary"]
    assert [r.id for r in results["b"]] == [f"{CH}/entity/mary"]
    n_queries = len(client.queries)
    assert n_queries == 1  # one grouped batch query
    # cache: repeat costs zero queries
    again = svc.reconcile_batch(queries)
    assert len(client.queries) == n_queries and again.keys() == results.keys()


# ---------------------------------------------------------------------------
# full offline pipeline: LLM JSON -> reconciliation -> SPARQL -> UUIDs
# ---------------------------------------------------------------------------


def test_text2sparql_end_to_end_offline(ch_store):
    llm_doc = {
        "distinct": True,
        "variables": [{"termType": "Variable", "value": "DigitalArtefact"}],
        "branches": [{
            "line": {
                "s": "DigitalArtefact", "p": P62, "o": "Entity_1",
                "sType": [DA], "oType": [],
                "values": [{"label": "madonna", "rdfTerm": {"type": "uri", "value": PLACEHOLDER}}],
            },
        }],
    }
    llm = FakeLLMClient({"artworks depicting the madonna": "```json\n" + json.dumps(llm_doc) + "\n```"})
    t2s = Text2SparqlRetrieval(llm, LocalKGSparqlClient(ch_store), raise_errors=True)
    uuids = t2s.retrieval("artworks depicting the madonna")
    assert sorted(uuids) == ["uuid-000", "uuid-002"]


def test_pipeline_drops_unresolvable_placeholder(ch_store):
    doc = {
        "distinct": True,
        "variables": [{"termType": "Variable", "value": "DigitalArtefact"}],
        "branches": [{
            "line": {
                "s": "DigitalArtefact", "p": P62, "o": "Entity_1",
                "sType": [DA], "oType": [],
                "values": [{"label": "zzz-no-such-entity", "rdfTerm": {"type": "uri", "value": PLACEHOLDER}}],
            },
        }],
    }
    pipeline = Text2JsonToSparqlPipeline(LocalKGSparqlClient(ch_store))
    _, sparql = pipeline.process_json_to_sparql(doc)
    assert PLACEHOLDER not in sparql
    out = execute(ch_store, sparql)
    # P62 is exact-match-only: the constraint was dropped, every artefact matches
    assert len(_uuids(out)) == 4
