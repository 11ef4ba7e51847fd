"""R2RML Turtle fixtures for the driver testdata tables — the engine's
analogue of the reference's ``tests/northwind/NorthwindR2RML.ttl`` fixture
(independent content, same vocabulary surface: tableName + sqlQuery logical
tables, template/column/constant term maps, rr:class, parentTriplesMap with
joinCondition)."""

DOCUMENTS_TTL = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .

<#DocMap>
  rr:logicalTable [ rr:tableName "documents" ] ;
  rr:subjectMap [
    rr:template "http://kg.ex/doc/{doc_id}" ;
    rr:class <http://kg.ex/c/Document>
  ] ;
  rr:predicateObjectMap [
    rr:predicate <http://kg.ex/p/lang> ;
    rr:objectMap [ rr:column "lang" ]
  ] ;
  rr:predicateObjectMap [
    rr:predicate <http://kg.ex/p/source> ;
    rr:objectMap [ rr:column "source" ]
  ] ;
  rr:predicateObjectMap [
    rr:predicate <http://kg.ex/p/n_chars> ;
    rr:objectMap [ rr:column "n_chars" ]
  ] .
"""

# SQL-view logical table (rr:sqlQuery): the view compiles to a streaming
# read_parquet(columns=...) + filter via sources.sqlview
DOCUMENTS_VIEW_TTL = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .

<#EnDocMap>
  rr:logicalTable [
    rr:sqlQuery "SELECT doc_id, lang, source, n_chars FROM documents WHERE lang = 'en'"
  ] ;
  rr:subjectMap [
    rr:template "http://kg.ex/doc/{doc_id}" ;
    rr:class <http://kg.ex/c/Document>
  ] ;
  rr:predicateObjectMap [
    rr:predicate <http://kg.ex/p/lang> ;
    rr:objectMap [ rr:column "lang" ]
  ] ;
  rr:predicateObjectMap [
    rr:predicate <http://kg.ex/p/source> ;
    rr:objectMap [ rr:column "source" ]
  ] ;
  rr:predicateObjectMap [
    rr:predicate <http://kg.ex/p/n_chars> ;
    rr:objectMap [ rr:column "n_chars" ]
  ] .
"""

# join-REQUIRING referencing object map: the parent subject template uses
# r_name, which is NOT among the join columns, so the ref cannot fold to a
# child-column template — pipelines.kg.ref_join_triples runs a real join
NATION_REGION_REF_TTL = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .

<#NationMap>
  rr:logicalTable [ rr:tableName "nation" ] ;
  rr:subjectMap [ rr:template "http://example.com/base/nation/n_nationkey={n_nationkey}" ] ;
  rr:predicateObjectMap [
    rr:predicate <http://example.com/base/nation#inRegionNamed> ;
    rr:objectMap [
      rr:parentTriplesMap <#RegionMap> ;
      rr:joinCondition [ rr:child "n_regionkey" ; rr:parent "r_regionkey" ]
    ]
  ] .

<#RegionMap>
  rr:logicalTable [ rr:tableName "region" ] ;
  rr:subjectMap [ rr:template "http://example.com/base/region/{r_name}" ] ;
  rr:predicateObjectMap [
    rr:predicate <http://example.com/base/region#r_name> ;
    rr:objectMap [ rr:column "r_name" ]
  ] .
"""
