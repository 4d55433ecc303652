import pytest

from knowledge_enhanced_multimodal_retrieval_tpu.knowledge.json2sparql import (
    PLACEHOLDER,
    SparnaturalToSparql,
    convert,
    infer_datatype,
)


def _line(s="Painting_1", p="http://crm/P1", o="Actor_1", sType=None, oType=None, values=None):
    line = {"s": s, "p": p, "o": o}
    if sType:
        line["sType"] = sType
    if oType:
        line["oType"] = oType
    if values is not None:
        line["values"] = values
    return line


def _query(branches, variables=("Painting_1",), distinct=True):
    return {
        "distinct": distinct,
        "variables": [{"termType": "Variable", "value": v} for v in variables],
        "branches": branches,
    }


def test_infer_datatype_table():
    cases = [
        (True, "xsd:boolean"),
        (3, "xsd:integer"),
        (3.5, "xsd:decimal"),
        ("42", "xsd:integer"),
        ("4.2", "xsd:decimal"),
        ("1850-01-01", "xsd:dateTime"),
        ("1850-01-01T00:00:00", "xsd:dateTime"),
        ("Mona Lisa", "xsd:string"),
    ]
    for value, expected in cases:
        assert infer_datatype(value) == expected, value


def test_basic_select_and_prefixes():
    sparql = convert(_query([{"line": _line(sType=["http://crm/E22"])}]))
    assert "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>" in sparql
    assert "PREFIX xsd:" in sparql
    assert "SELECT DISTINCT ?Painting_1 WHERE {" in sparql
    assert "?Painting_1 rdf:type <http://crm/E22>." in sparql
    assert "?Painting_1 <http://crm/P1> ?Actor_1." in sparql
    assert sparql.rstrip().endswith("}")


def test_non_distinct():
    sparql = convert(_query([{"line": _line()}], distinct=False))
    assert "SELECT ?Painting_1 WHERE" in sparql
    assert "DISTINCT" not in sparql


def test_multi_type_union():
    sparql = convert(_query([{"line": _line(sType=["http://crm/A", "http://crm/B"])}]))
    assert "{ ?Painting_1 rdf:type <http://crm/A>. }" in sparql
    assert "UNION" in sparql
    assert "{ ?Painting_1 rdf:type <http://crm/B>. }" in sparql


def test_otype_declared_once():
    branches = [
        {"line": _line(o="Actor_1", oType=["http://crm/E39"])},
        {"line": _line(p="http://crm/P2", o="Actor_1", oType=["http://crm/E39"])},
    ]
    sparql = convert(_query(branches))
    assert sparql.count("?Actor_1 rdf:type <http://crm/E39>.") == 1


def test_single_uri_value():
    values = [{"label": "Leonardo", "rdfTerm": {"type": "uri", "value": "http://kg/leo"}}]
    sparql = convert(_query([{"line": _line(values=values)}]))
    assert "?Painting_1 <http://crm/P1> <http://kg/leo>." in sparql
    assert "# Leonardo" in sparql
    assert "?Actor_1" not in sparql  # object var replaced by the bound URI


def test_multiple_uri_values_union():
    values = [
        {"label": "a", "rdfTerm": {"type": "uri", "value": "http://kg/a"}},
        {"label": "b", "rdfTerm": {"type": "uri", "value": "http://kg/b"}},
    ]
    sparql = convert(_query([{"line": _line(values=values)}]))
    assert "{ ?Painting_1 <http://crm/P1> <http://kg/a>. } # a" in sparql
    assert "UNION" in sparql
    assert "{ ?Painting_1 <http://crm/P1> <http://kg/b>. } # b" in sparql


def test_placeholder_values_dropped():
    values = [{"label": "x", "rdfTerm": {"type": "uri", "value": PLACEHOLDER}}]
    sparql = convert(_query([{"line": _line(values=values)}]))
    assert PLACEHOLDER not in sparql
    assert "<http://crm/P1>" not in sparql  # constraint dropped entirely


def test_literal_values_filters():
    values = [{"rdfTerm": {"type": "literal", "value": "42"}}]
    sparql = convert(_query([{"line": _line(values=values)}]))
    assert 'FILTER(?Actor_1 = "42"^^xsd:integer)' in sparql
    values = [{"rdfTerm": {"type": "literal", "value": "Mona Lisa"}}]
    sparql = convert(_query([{"line": _line(values=values)}]))
    assert 'FILTER(?Actor_1 = "Mona Lisa"@en)' in sparql


def test_range_restrictions():
    values = [{"min": 10, "max": 50, "label": "height"}]
    sparql = convert(_query([{"line": _line(o="Value_1", values=values)}]))
    assert 'FILTER((?Value_1 >= "10"^^xsd:integer) && (?Value_1 <= "50"^^xsd:integer))' in sparql
    values = [{"min": "1800-01-01"}]
    sparql = convert(_query([{"line": _line(o="Date_1", values=values)}]))
    assert 'FILTER(?Date_1 >= "1800-01-01"^^xsd:dateTime)' in sparql


def test_optional_and_not_exists_scoping():
    branches = [
        {"line": _line(), "optional": True},
        {"line": _line(p="http://crm/P2", o="B_1"), "notExists": True},
    ]
    sparql = convert(_query(branches))
    assert "OPTIONAL {" in sparql
    assert "FILTER NOT EXISTS {" in sparql
    assert sparql.count("}") >= 3


def test_children_recursion():
    branches = [
        {
            "line": _line(o="Actor_1"),
            "children": [{"line": {"s": "Actor_1", "p": "http://crm/P3", "o": "Name_1"}}],
        }
    ]
    sparql = convert(_query(branches)).replace("\n", " ")
    assert "?Actor_1 <http://crm/P3> ?Name_1." in sparql


def test_branch_without_line_ignored():
    sparql = convert(_query([{"children": []}, {"line": _line()}]))
    assert "?Painting_1 <http://crm/P1> ?Actor_1." in sparql


def test_custom_prefix():
    conv = SparnaturalToSparql()
    conv.add_prefix("crm", "http://www.cidoc-crm.org/cidoc-crm/")
    sparql = conv.convert(_query([{"line": _line()}]))
    assert "PREFIX crm: <http://www.cidoc-crm.org/cidoc-crm/>" in sparql


def test_golden_full_query():
    """One golden end-to-end document exercising most features at once."""
    query = {
        "distinct": True,
        "variables": [
            {"termType": "Variable", "value": "DigitalArtefact"},
            {"termType": "Variable", "value": "Label_1"},
        ],
        "branches": [
            {
                "line": {
                    "s": "DigitalArtefact",
                    "p": "http://www.cidoc-crm.org/cidoc-crm/P62_depicts",
                    "o": "Concept_1",
                    "sType": ["http://kg/DigitalArtefact"],
                    "values": [
                        {"label": "madonna", "rdfTerm": {"type": "uri", "value": "http://kg/ent/madonna"}}
                    ],
                },
                "children": [
                    {
                        "line": {
                            "s": "DigitalArtefact",
                            "p": "http://www.w3.org/2000/01/rdf-schema#label",
                            "o": "Label_1",
                        },
                        "optional": True,
                    }
                ],
            }
        ],
    }
    sparql = convert(query)
    lines = [l.strip() for l in sparql.splitlines()]
    assert "SELECT DISTINCT ?DigitalArtefact ?Label_1 WHERE {" in lines
    assert "?DigitalArtefact rdf:type <http://kg/DigitalArtefact>." in lines
    assert "?DigitalArtefact <http://www.cidoc-crm.org/cidoc-crm/P62_depicts> <http://kg/ent/madonna>." in lines
    assert "OPTIONAL {" in lines
    assert "?DigitalArtefact <http://www.w3.org/2000/01/rdf-schema#label> ?Label_1." in lines
