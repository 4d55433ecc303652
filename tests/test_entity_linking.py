import json

import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.knowledge import (
    FakeKGSparqlClient,
    FakeLLMClient,
    FakeSparqlClient,
    QueryInput,
    ReconciliationService,
    SparnaturalPostProcessor,
    Text2JsonToSparqlPipeline,
    Text2SparqlRetrieval,
    fix_dimension_query,
    fix_label_union,
    strip_json_fences,
)
from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.json2sparql import PLACEHOLDER

P62 = "http://www.cidoc-crm.org/cidoc-crm/P62_depicts"


def _kg():
    return FakeKGSparqlClient(
        entities={
            "leonardo": ["http://kg/ent/leonardo-da-vinci", "http://kg/ent/leo"],
            "madonna": ["http://kg/ent/madonna"],
        },
        artefacts=["http://kg/artefact/uuid-1", "http://kg/artefact/uuid-2"],
    )


def _json_with_placeholder(label="leonardo", predicate="http://crm/P14"):
    return {
        "distinct": True,
        "variables": [{"termType": "Variable", "value": "DigitalArtefact"}],
        "branches": [
            {
                "line": {
                    "s": "DigitalArtefact",
                    "p": predicate,
                    "o": "Actor_1",
                    "sType": ["http://kg/DigitalArtefact"],
                    "oType": ["http://kg/Person"],
                    "values": [{"label": label, "rdfTerm": {"type": "uri", "value": PLACEHOLDER}}],
                }
            }
        ],
    }


def test_search_entity_fuzzy_and_sorting():
    kg = _kg()
    svc = ReconciliationService(kg)
    results = svc.search_entity("Leonardo", type_uri=["http://kg/Person"], predicate="http://crm/P14")
    assert [r.id for r in results] == ["http://kg/ent/leo", "http://kg/ent/leonardo-da-vinci"]  # sorted by len
    q = kg.queries[-1]
    assert "STRSTARTS" in q and "CONTAINS" in q  # fuzzy filter
    assert "?x a <http://kg/Person>" in q


def test_search_entity_exact_for_p62():
    kg = _kg()
    svc = ReconciliationService(kg)
    svc.search_entity("madonna", predicate=P62)
    q = kg.queries[-1]
    assert "STRSTARTS" not in q  # exact-match-only filter
    assert 'LCASE(STR(?label)) = "madonna"' in q


def test_reconcile_batch_caches():
    kg = _kg()
    svc = ReconciliationService(kg)
    queries = {"k1": QueryInput("leonardo", ["http://kg/Person"], "http://crm/P14")}
    r1 = svc.reconcile_batch(queries)
    n_queries = len(kg.queries)
    r2 = svc.reconcile_batch(queries)
    assert len(kg.queries) == n_queries  # served from cache
    assert [x.id for x in r1["k1"]] == [x.id for x in r2["k1"]]


def test_reconcile_batch_groups_by_type_predicate():
    kg = _kg()
    svc = ReconciliationService(kg)
    queries = {
        "a": QueryInput("leonardo", ["http://kg/Person"], "http://crm/P14"),
        "b": QueryInput("madonna", ["http://kg/Person"], "http://crm/P14"),
        "c": QueryInput("madonna", ["http://kg/Concept"], P62),
    }
    results = svc.reconcile_batch(queries)
    assert len(kg.queries) == 2  # one per (type, predicate) group
    assert results["a"][0].id.startswith("http://kg/ent/leo")
    assert results["c"][0].id == "http://kg/ent/madonna"


def test_batch_failure_falls_back_to_single():
    fake = FakeSparqlClient()
    calls = {"n": 0}

    def handler(q):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("batch boom")
        return {
            "results": {"bindings": [
                {"x": {"value": "http://kg/e1"}},
            ]}
        }

    fake.handler = handler
    svc = ReconciliationService(fake)
    out = svc.reconcile_batch({"k": QueryInput("leonardo", None, "http://crm/P14")})
    assert [r.id for r in out["k"]] == ["http://kg/e1"]
    assert calls["n"] == 2  # batch + single fallback


def test_postprocessor_injects_multiple_uris():
    kg = _kg()
    pp = SparnaturalPostProcessor(ReconciliationService(kg))
    doc = _json_with_placeholder("leonardo")
    out = pp.process(doc)
    values = out["branches"][0]["line"]["values"]
    assert values[0]["rdfTerm"]["value"] == "http://kg/ent/leo"
    assert values[1]["rdfTerm"]["value"] == "http://kg/ent/leonardo-da-vinci"
    assert all("_placeholder_key" not in v for v in values)


def test_postprocessor_unresolved_leaves_placeholder():
    kg = _kg()
    pp = SparnaturalPostProcessor(ReconciliationService(kg))
    doc = _json_with_placeholder("nobody-known")
    out = pp.process(doc)
    assert out["branches"][0]["line"]["values"][0]["rdfTerm"]["value"] == PLACEHOLDER


def test_postprocessor_type_error():
    pp = SparnaturalPostProcessor(ReconciliationService(_kg()))
    with pytest.raises(TypeError):
        pp.process(["not", "a", "dict"])


def test_fix_dimension_query():
    sparql = (
        "SELECT ?x WHERE {\n"
        "  ?Painting_1 <http://www.cidoc-crm.org/cidoc-crm/P43_has_dimension> ?Dimension_1.\n"
        "  ?Dimension_1 rdf:type <http://www.cidoc-crm.org/cidoc-crm/E54_Dimension>.\n"
        "  ?Dimension_1 <http://www.cidoc-crm.org/cidoc-crm/P90_has_value> ?Value_3.\n"
        "  FILTER(?Value_3 >= \"10\"^^xsd:integer)\n"
        "}"
    )
    fixed = fix_dimension_query(sparql)
    assert "# Dimensions (auto-fixed)" in fixed
    assert "?Painting_1 <http://www.cidoc-crm.org/cidoc-crm/P43_has_dimension> ?Dimension_1." in fixed
    assert "?Dimension_1 <http://www.cidoc-crm.org/cidoc-crm/P90_has_value> ?Value_3." in fixed
    assert "FILTER(?Value_3" in fixed


def test_fix_dimension_noop_without_values():
    assert fix_dimension_query("SELECT ?x WHERE { ?a ?b ?c }") == "SELECT ?x WHERE { ?a ?b ?c }"


def test_fix_label_union():
    sparql = "?DigitalArtefact <http://www.w3.org/2000/01/rdf-schema#label> ?Label_1 ."
    fixed = fix_label_union(sparql)
    assert "UNION" in fixed
    assert "<https://schema.org/description>" in fixed


def test_pipeline_end_to_end_json_to_sparql():
    kg = _kg()
    pipeline = Text2JsonToSparqlPipeline(kg)
    doc = _json_with_placeholder("leonardo")
    processed, sparql = pipeline.process_json_to_sparql(doc)
    assert "http://kg/ent/leo" in sparql
    assert PLACEHOLDER not in sparql
    assert "UNION" in sparql  # two resolved URIs -> UNION alternates


def test_strip_json_fences():
    assert strip_json_fences('```json\n{"a": 1}\n```') == '\n{"a": 1}\n'
    assert strip_json_fences('{"a": 1}') == '{"a": 1}'
    assert json.loads(strip_json_fences('```\n{"a": 1}\n```'))["a"] == 1


def test_text2sparql_retrieval_full_stack():
    kg = _kg()
    llm = FakeLLMClient({"paintings by leonardo": "```json\n" + json.dumps(_json_with_placeholder()) + "\n```"})
    t2s = Text2SparqlRetrieval(llm, kg)
    uuids = t2s.retrieval("paintings by leonardo")
    assert uuids == ["uuid-1", "uuid-2"]
    assert llm.calls == ["paintings by leonardo"]


def test_text2sparql_retrieval_degrades_to_empty():
    kg = _kg()
    llm = FakeLLMClient({}, default="this is not json")
    t2s = Text2SparqlRetrieval(llm, kg)
    assert t2s.retrieval("whatever") == []
    with pytest.raises(Exception):
        Text2SparqlRetrieval(llm, kg, raise_errors=True).retrieval("whatever")
